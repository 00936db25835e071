"""Pallas TPU kernel: fused kz->z inverse + mask + block-max epilogue.

Round-3 profile of the dft_fused sweep (tools/profile_sweep.py, one
v5e chip, 128^3, rank-2 coupling): the fused forward/coupling/inverse
kernel leaves 0.031 ms/rot in the Hermitian kz->z einsum and 0.077
ms/rot in masking + exact block top-K — both HBM-bound on the full
score volume ``S [chunk, L, L, L]`` (8.4 MB/rotation written by the
einsum, then re-read by the mask and the block-max reduce).  S carries
no information the pose search needs beyond (a) per-block maxima and
(b) the contents of the few winning blocks.

This kernel computes, per (x-tile, rotation) grid cell, entirely in
VMEM:

    S[xy, z]  = D_re[k, xy] . Mz_re[k, z] - D_im[k, xy] . Mz_im[k, z]
    S        += bias                       (0 / -inf translation mask)
    bmax      = max over 32-wide y-runs    (pairwise-max tree)

so the ONLY HBM traffic after the main fused kernel is D in (which the
kz->z einsum read anyway) and the 32x-smaller block-max volume out —
the score volume never exists in HBM.  The exact top-K then runs on
the block maxes, and an XLA drill-down recomputes the winning blocks'
scores from D (a [K, 32] contraction per candidate block; see
:func:`drill_topk`).  Exactness argument is the same as
sweep/topk.py's: every element outside the selected blocks is beaten
by >= K block maxima.

Blocks are 32-wide Y-RUNS (fixed x, z) rather than the z-runs
sweep/topk.py uses on raw volumes: the reduction then runs over a
sublane-grouped axis, which Mosaic lowers as a cheap pairwise-max
tree, while a 32-wide minor-axis split would fight the 128-lane tile.
The flat indices returned to the sweep are converted to the canonical
``x*L^2 + y*L + z`` convention, so DockResult shifts are unchanged.

Replaces the score-volume tail of the reference's per-rotation peak
harvest [U: DeepLocalProteinDocking/Models/EQDockerGPU.py — mount
empty] with a fused TPU reduction; selected automatically by
sweep/resplat.py for ``fft_impl='dft_fused', topk_impl='exact'`` on
TPU with ``grid_size % 32 == 0``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TX = 8          # x rows per program
YB = 32         # block width along y (matches sweep/topk.py's 32)


def _invz_bmax_kernel(dre_ref, dim_ref, mzre_ref, mzim_ref, bias_ref,
                      out_ref):
    """Per x row (unrolled TX): S_x = Re{D[:, x, :]^T Mz} + bias_x,
    then a pairwise-max tree over 32-wide y runs.  The per-row dots
    contract the LEADING k dim and no flat (K, TX*Y) reshape is formed
    — Mosaic rejects that shape cast when Y is not lane-aligned
    (measured: 64-grids failed to compile with the flattened form)."""
    f32 = jnp.float32
    Y = dre_ref.shape[3]
    Z = mzre_ref.shape[1]
    dn = (((0,), (0,)), ((), ()))
    for x in range(TX):
        dre_x = dre_ref[0, :, x, :]                # [K, Y]
        dim_x = dim_ref[0, :, x, :]
        S = (jax.lax.dot_general(dre_x, mzre_ref[:], dn,
                                 preferred_element_type=f32)
             - jax.lax.dot_general(dim_x, mzim_ref[:], dn,
                                   preferred_element_type=f32))
        S = S + bias_ref[0, x]                     # [Y, Z]
        # Block-max over 32-wide y runs: pairwise-max tree over the
        # sublane-grouped middle axis (guaranteed-lowerable slices).
        m = S.reshape(Y // YB, YB, Z)
        w = YB
        while w > 1:
            w //= 2
            m = jnp.maximum(m[:, :w], m[:, w:2 * w])
        out_ref[0, x] = m.reshape(Y // YB, Z)


def _invz_blockmax_call(Dre, Dim, MzRe, MzIm, bias, interpret):
    """One pallas_call; ``bias [G, X, Y, Z]`` with G dividing b — each
    contiguous run of ``b // G`` batch rows shares bias group
    ``bb // (b // G)`` (the layout the custom-vmap fold produces)."""
    b, K, X, Y = Dre.shape
    Z = MzRe.shape[1]
    G = bias.shape[0]
    if X % TX or Y % YB:
        raise ValueError(f"invz_blockmax needs X % {TX} == 0 and "
                         f"Y % {YB} == 0, got {X}x{Y}")
    if b % G:
        raise ValueError(f"bias groups G={G} must divide batch b={b}")
    bpg = b // G
    grid = (X // TX, b)    # b innermost: Mz + bias tiles stay resident
    f32 = jnp.float32
    flops = 2 * K * X * Y * Z * 2
    cost = pl.CostEstimate(
        flops=flops * b,
        bytes_accessed=(Dre.size + Dim.size) * Dre.dtype.itemsize
        + bias.size * 4 + b * X * (Y // YB) * Z * 4,
        transcendentals=0)
    return pl.pallas_call(
        _invz_bmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, TX, Y), lambda xt, bb: (bb, 0, xt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, TX, Y), lambda xt, bb: (bb, 0, xt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Z), lambda xt, bb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Z), lambda xt, bb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TX, Y, Z),
                         lambda xt, bb: (bb // bpg, xt, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TX, Y // YB, Z),
                               lambda xt, bb: (bb, xt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, X, Y // YB, Z), f32),
        cost_estimate=cost,
        interpret=interpret,
    )(Dre.astype(f32), Dim.astype(f32), MzRe.astype(f32),
      MzIm.astype(f32), bias.astype(f32))


@functools.lru_cache(maxsize=2)
def _invz_blockmax_batchable(interpret: bool):
    """custom_vmap wrapper: ``jax.vmap`` of this function FOLDS the
    mapped axis into the kernel's existing ``b`` grid axis instead of
    batching the pallas_call itself.

    Round 4 measured that a vmapped ``pallas_call`` of this kernel
    faults the TPU worker (the rerank row of the held-out matrix died
    reproducibly), which forced every batched caller — rescore's
    per-head cone sweeps, parallel.batch_eval's complex groups,
    dock_ensemble's pair batches — to pin ``fused_topk=False`` and pay
    the full score-volume HBM traffic exactly where throughput matters
    most.  The fold below reshapes ``[n, b, ...]`` D tiles to
    ``[n*b, ...]`` and stacks per-batch bias volumes as kernel bias
    GROUPS (each group serving its ``b`` rotations via the
    ``bb // (b // G)`` index map), so the batched entry runs the same
    single-launch kernel shape the unbatched sweep already validated.
    Nested vmaps recurse through the same rule.
    """
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(Dre, Dim, MzRe, MzIm, bias):
        return _invz_blockmax_call(Dre, Dim, MzRe, MzIm, bias,
                                   interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, Dre, Dim, MzRe, MzIm, bias):
        db, dib, mzb, mzib, bb = in_batched
        n = axis_size
        if mzb or mzib:
            # Per-batch inverse twiddles never occur in this codebase
            # (Mz depends only on the static grid size); if they ever
            # do, fall back to a sequential map rather than mis-fold.
            args = [a if ab else jnp.broadcast_to(a[None],
                                                  (n,) + a.shape)
                    for a, ab in zip((Dre, Dim, MzRe, MzIm, bias),
                                     in_batched)]
            return jax.lax.map(lambda a: f(*a), tuple(args)), True
        # Dre/Dim broadcast INDEPENDENTLY: an asymmetric vmap (one of
        # them closed over) must not reshape an unbatched [K, X, Y]
        # into the folded [n*b, ...] layout.
        if not db:
            Dre = jnp.broadcast_to(Dre[None], (n,) + Dre.shape)
        if not dib:
            Dim = jnp.broadcast_to(Dim[None], (n,) + Dim.shape)
        b = Dre.shape[1]
        Dre2 = Dre.reshape((n * b,) + Dre.shape[2:])
        Dim2 = Dim.reshape((n * b,) + Dim.shape[2:])
        if bb:
            bias2 = bias.reshape((n * bias.shape[1],) + bias.shape[2:])
        elif bias.shape[0] == 1:
            bias2 = bias            # one shared group covers all n*b
        else:
            bias2 = jnp.broadcast_to(
                bias[None], (n,) + bias.shape).reshape(
                    (n * bias.shape[0],) + bias.shape[1:])
        out = f(Dre2, Dim2, MzRe, MzIm, bias2)     # [n*b, X, NBy, Z]
        return out.reshape((n, b) + out.shape[1:]), True

    return f


def invz_blockmax(Dre: jax.Array, Dim: jax.Array,
                  MzRe: jax.Array, MzIm: jax.Array,
                  bias: jax.Array, interpret: bool = False) -> jax.Array:
    """Block maxima ``[b, X, Y//32, Z]`` of the score volumes.

    ``Dre/Dim [b, K, X, Y]`` from correlate/pallas_fused.py;
    ``MzRe/MzIm [K, Z]`` Hermitian-weighted inverse twiddles;
    ``bias`` additive translation mask (0 valid / -inf masked), either
    ``[X, Y, Z]`` (shared across the batch) or ``[G, X, Y, Z]`` with G
    dividing b (each contiguous b//G run shares a group).  Equivalent
    to ``max`` over y-runs of ``einsum(D, Mz) + bias`` without
    materializing the score volume.  ``jax.vmap`` folds the mapped axis
    into ``b`` (see :func:`_invz_blockmax_batchable`) — batched callers
    never emit a vmapped pallas_call.
    """
    if bias.ndim == 3:
        bias = bias[None]
    return _invz_blockmax_batchable(bool(interpret))(
        Dre, Dim, MzRe, MzIm, bias)


def drill_topk(Dre: jax.Array, Dim: jax.Array,
               MzRe: jax.Array, MzIm: jax.Array,
               bias_flat: jax.Array | None,
               bmax: jax.Array, top_k: int):
    """Exact top-K from block maxima + a D-space drill-down.

    ``bmax [b, X, NBy, Z]`` from :func:`invz_blockmax`; returns
    ``(vals [b, K], flat [b, K])`` with flat indices in the canonical
    ``x*L^2 + y*L + z`` order of the full score volume.  The winning
    blocks' 32 candidate scores are recomputed from ``D`` with the
    same contraction the kernel used (a [K_freq, 32] x [K_freq]
    gather-einsum per block — a few thousand FLOPs), so the score
    volume is never needed.
    """
    from deeplocalproteindocking_tpu.sweep.topk import exact_block_topk
    b, X, NBy, Z = bmax.shape
    Y = NBy * YB
    kf = Dre.shape[1]
    # Top-k block ids by their maxima (exact; two-stage over b*NB).
    _, bid = exact_block_topk(bmax.reshape(b, X * NBy * Z), top_k)
    x = bid // (NBy * Z)                            # [b, k]
    yb = (bid // Z) % NBy
    z = bid % Z
    ys = yb[..., None] * YB + jnp.arange(YB)        # [b, k, 32]

    def gather_one(Dr, Di, xi, yi, zi):
        # Dr/Di [K, X, Y]; xi/zi [k]; yi [k, 32] -> cols [K, k, 32].
        cr = Dr[:, xi[:, None], yi]
        ci = Di[:, xi[:, None], yi]
        mr = MzRe[:, zi]                            # [K, k]
        mi = MzIm[:, zi]
        return (jnp.einsum("Kkj,Kk->kj", cr, mr,
                           preferred_element_type=jnp.float32)
                - jnp.einsum("Kkj,Kk->kj", ci, mi,
                             preferred_element_type=jnp.float32))

    vals = jax.vmap(gather_one)(
        Dre.astype(jnp.float32), Dim.astype(jnp.float32), x, ys, z)
    flat = (x[..., None] * (Y * Z) + ys * Z
            + z[..., None]).astype(jnp.int32)      # [b, k, 32]
    if bias_flat is not None:
        vals = vals + bias_flat[flat]
    best, ci = jax.lax.top_k(vals.reshape(b, top_k * YB), top_k)
    flat_sel = jnp.take_along_axis(flat.reshape(b, top_k * YB), ci,
                                   axis=1)
    return best, flat_sel
