"""Pallas TPU kernel: fused inverse-DFT of the correlation spectrum.

The XLA einsum formulation of the inverse transform (correlate/dft.py:
``DFTCorrelator.inverse``) pays layout churn on every pass: the 65-wide
rfft axis pads 2x onto the 128-lane dim and each einsum round-trips
HBM.  Hybrid design here (shaped by what Mosaic lowers well — it
rejects minor-dim transposes and non-tile-aligned reshapes):

* the Hermitian-weighted kz -> z pass runs FIRST as one XLA einsum,
  eliminating the 65-wide axis so everything downstream is 128-aligned;
* a Pallas kernel fuses the remaining kx -> x and ky -> y passes with
  grid ``(b, x_tile, ky_block)``: pass B is one big MXU matmul
  ``[TX, L] x [L, KYB*L]`` per step (the ky-block slab reshape is
  layout-free), pass C accumulates the real part into a VMEM scratch
  ``d[TX, L, L]`` across ky blocks, and the final tile write is the
  only HBM output.

Oracle-tested against the einsum inverse (tests/test_pallas_idft.py);
selected via ``fft_impl="dft_pallas"``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TX = 8          # x rows per program
KYB = 16        # ky block (streamed innermost)


def _idft_bc_kernel(ere_ref, eim_ref, uxre_ref, uxim_ref, uyre_ref,
                    uyim_ref, out_ref, dacc):
    """Passes B (kx->x) and C (ky->y, real part) for one (b, xt) tile."""
    f32 = jnp.float32
    L = ere_ref.shape[1]
    kyb = pl.program_id(2)
    n_kyb = pl.num_programs(2)

    @pl.when(kyb == 0)
    def _init():
        dacc[:] = jnp.zeros_like(dacc)

    # Pass B: f[x8, (kyb, z)] = sum_kx Ux^T[x8, kx] * E[kx, ky_blk, z]
    # The [1, L, KYB, L] block reshapes to [L, KYB*L] with no layout
    # change (minor dims stay contiguous and 128-aligned).
    ere = ere_ref[0].reshape(L, KYB * L)
    eim = eim_ref[0].reshape(L, KYB * L)
    uxre, uxim = uxre_ref[:], uxim_ref[:]          # [TX, L]
    fre = (jnp.dot(uxre, ere, preferred_element_type=f32)
           - jnp.dot(uxim, eim, preferred_element_type=f32))
    fim = (jnp.dot(uxre, eim, preferred_element_type=f32)
           + jnp.dot(uxim, ere, preferred_element_type=f32))

    # Pass C: d[x, y, z] += Re{ sum_ky Uy[ky, y] * f[x, ky, z] }
    # Contract the LEADING ky dim of both operands (dot_general; no
    # transpose — Mosaic rejects minor-dim transposes).
    uyre, uyim = uyre_ref[:], uyim_ref[:]          # [KYB, L(y)]
    dn = (((0,), (0,)), ((), ()))
    for x in range(TX):
        fx_re = fre[x].reshape(KYB, L)
        fx_im = fim[x].reshape(KYB, L)
        dacc[x] += (
            jax.lax.dot_general(uyre, fx_re, dn,
                                preferred_element_type=f32)
            - jax.lax.dot_general(uyim, fx_im, dn,
                                  preferred_element_type=f32))

    @pl.when(kyb == n_kyb - 1)
    def _finalize():
        out_ref[0] = dacc[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_inverse(gre: jax.Array, gim: jax.Array,
                   uxre, uxim, uyre, uyim, mzre, mzim,
                   interpret: bool = False) -> jax.Array:
    """``G (re, im) [B, L, L, L//2+1]`` -> real ``S [B, L, L, L]``.

    Twiddles as produced by DFTCorrelator: Ux/Uy ``[k, pos]``,
    Mz ``[kz, z]`` (Hermitian-weighted, 1/L folded per axis).
    """
    f32 = jnp.float32
    B, L = gre.shape[0], gre.shape[1]
    if L % TX or L % KYB:
        # Silent remainder rows would produce wrong score volumes.
        raise ValueError(
            f"fft_impl='dft_pallas' needs grid_size divisible by "
            f"{TX} and {KYB}; got {L}. Use fft_impl='dft_fused' or "
            f"'dft' for this grid size.")
    mzre = jnp.asarray(mzre, f32)
    mzim = jnp.asarray(mzim, f32)
    # Pass A in XLA: kz -> z with the complex Hermitian-weighted Mz.
    # E = G @ Mz (complex): kills the 65-wide axis before the kernel.
    ere = (jnp.einsum("bijk,kz->bijz", gre, mzre,
                      preferred_element_type=f32)
           - jnp.einsum("bijk,kz->bijz", gim, mzim,
                        preferred_element_type=f32))
    eim = (jnp.einsum("bijk,kz->bijz", gre, mzim,
                      preferred_element_type=f32)
           + jnp.einsum("bijk,kz->bijz", gim, mzre,
                        preferred_element_type=f32))

    uxre_t = jnp.asarray(uxre, f32).T              # [x, kx] row tiles
    uxim_t = jnp.asarray(uxim, f32).T
    uyre_b = jnp.asarray(uyre, f32)                # [ky, y] row blocks
    uyim_b = jnp.asarray(uyim, f32)

    grid = (B, L // TX, L // KYB)
    return pl.pallas_call(
        _idft_bc_kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, L, L), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, KYB, L),
                         lambda b, xt, kyb: (b, 0, kyb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, KYB, L),
                         lambda b, xt, kyb: (b, 0, kyb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TX, L), lambda b, xt, kyb: (xt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TX, L), lambda b, xt, kyb: (xt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KYB, L), lambda b, xt, kyb: (kyb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KYB, L), lambda b, xt, kyb: (kyb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TX, L, L),
                               lambda b, xt, kyb: (b, xt, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TX, L, L), jnp.float32)],
        interpret=interpret,
    )(ere, eim, uxre_t, uxim_t, uyre_b, uyim_b)


def correlator_pallas_inverse(corr, gre, gim, interpret=None):
    """Run the kernel with a DFTCorrelator's twiddles.

    ``interpret=None`` auto-selects: compiled on TPU, interpreter on the
    CPU backend (where Mosaic lowering is unavailable) so tests and the
    virtual-device mesh exercise identical code.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pallas_inverse(gre, gim, corr.UxRe, corr.UxIm, corr.UyRe,
                          corr.UyIm, corr.MzRe, corr.MzIm,
                          interpret=interpret)
