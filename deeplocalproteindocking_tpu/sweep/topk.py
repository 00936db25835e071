"""Exact two-stage top-K for huge score volumes.

``jax.lax.top_k`` over a 128^3 = 2.1M-element score volume costs
~0.45 ms/rotation on v5e (measured in-scan, tools/profile_sweep.py) —
the sort network runs on the VPU and dominates once the DFT is matmul
-formulated.  This module computes the EXACT top-K two-stage:

1. block-reduce: max over contiguous blocks of ``block`` elements
   (a fast VPU reduction over the minor axis);
2. ``top_k`` over the ~n/block block-maxes (block times cheaper);
3. gather the K winning blocks' full contents (K x block candidates)
   and re-``top_k``.

Exactness: any element e outside the K max-blocks satisfies
``e <= max(its block) < each of the K selected block maxes``, so at
least K elements beat it and e cannot be in the top-K.  (Ties are a
value-set tie: the returned VALUES are exactly the top-K multiset;
which of several equal-valued cells is returned may differ from
``lax.top_k``'s index order, same as any tie-breaking scheme.)

This replaces the reference's per-rotation peak harvest
[U: DeepLocalProteinDocking/Models/EQDockerGPU.py — mount empty] with a
TPU-shaped exact reduction; measured ~5x faster than direct top_k at
K=64, block=32 on 128^3 volumes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_block_topk(x: jax.Array, k: int, block: int = 32):
    """Exact top-k over the last axis of ``x [B, n]``.

    Returns ``(values [B, k], flat_indices [B, k])`` — the same value
    multiset as ``jax.lax.top_k(x, k)`` (index tie-order may differ).
    ``n`` must be divisible by ``block``; ``n // block >= k``.
    """
    B, n = x.shape
    if n % block:
        raise ValueError(f"n={n} not divisible by block={block}")
    nb = n // block
    if nb < k:
        # Degenerate: fewer blocks than k — plain top_k is cheap here.
        return jax.lax.top_k(x, k)
    xb = x.reshape(B, nb, block)
    bmax = xb.max(axis=-1)                              # [B, nb]
    _, bidx = jax.lax.top_k(bmax, k)                    # [B, k]
    # Gather the k winning blocks' contents: [B, k, block].
    cand = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
    vals, ci = jax.lax.top_k(cand.reshape(B, k * block), k)
    # ci = j * block + o where j indexes the selected blocks.
    flat = jnp.take_along_axis(bidx, ci // block, axis=1) * block \
        + ci % block
    return vals, flat
