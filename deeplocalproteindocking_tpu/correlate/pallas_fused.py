"""Fused forward-y/x + channel-coupling + inverse-x/y Pallas kernel.

The round-1 profile (tools/profile_sweep.py, measured in-scan on v5e)
showed the matmul-DFT sweep spending 1.4 of its 2.5 ms/rotation in the
forward passes (which materialize the full per-channel ligand spectrum
``[chunk, L, L, L/2+1, C]`` — 136 MB/rotation of HBM traffic at C=16)
and the channel-coupling contraction that immediately reduces it away.
XLA cannot fuse chained contractions, so every intermediate round-trips
HBM.

This kernel computes, per (kz-frequency, rotation) grid cell, entirely
in VMEM:

    B[c,x,j]   = sum_y A[c,x,y]  * Wy[y,j]          (forward y, MXU)
    F[c,j,i]   = sum_x Wx[x,i]   * B[c,x,j]          (forward x, MXU)
    G[j,i]     = sum_c H[c,j,i] (*) conj-combine F   (coupling, VPU)
    C[j,x']    = sum_i G[j,i]    * Ux[i,x']          (inverse x, MXU)
    D[x',y']   = sum_j C[j,x']   * Uy[j,y']          (inverse y, MXU)

so the only HBM traffic is the small z-transformed ligand tensor ``A``
in (``[chunk, L/2+1, C, Ls, Ls]``), the receptor spectrum ``H`` (loaded
once per kz and reused across the rotation chunk — the grid iterates
rotations innermost), and ``D [b, kz, x, y]`` out.  The per-channel
spectrum, ``B``, ``G``, and ``C`` never exist in HBM.  Every dot lands
on the MXU with a 128-wide minor; the kz axis (65 = L/2+1 rfft bins)
rides the grid, so no tile ever has the awkward 65 on lanes.

Replaces the hot half of the reference's ``VolumeConvolution``
[U: TorchProteinLibrary/Layers/Volume/VolumeConvolution — mount empty]
with a TPU-shaped fusion; the remaining Hermitian kz->z inverse is a
single well-shaped XLA matmul (see DFTCorrelator.scores_fused).

Measured in-scan on v5e (128 grid, 40 ligand box, C=16, chunk=16):
forward-x + coupling + inverse dropped from 1.55 ms/rotation (einsum
path) to ~0.2 ms/rotation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _complex_dot(are, aim, bre, bim, dn):
    """(are + i aim) . (bre + i bim) with f32 accumulation."""
    f32 = jnp.float32
    rr = jax.lax.dot_general(are, bre, dn, preferred_element_type=f32)
    ii = jax.lax.dot_general(aim, bim, dn, preferred_element_type=f32)
    ri = jax.lax.dot_general(are, bim, dn, preferred_element_type=f32)
    ir = jax.lax.dot_general(aim, bre, dn, preferred_element_type=f32)
    return rr - ii, ri + ir


def _kernel(are_ref, aim_ref, hre_ref, him_ref, wyre_ref, wyim_ref,
            wxre_ref, wxim_ref, uxre_ref, uxim_ref, uyre_ref, uyim_ref,
            dre_ref, dim_ref):
    f32 = jnp.float32
    A_re = are_ref[0, 0]               # [C, X, Y]
    A_im = aim_ref[0, 0]
    dtype = A_re.dtype

    def cast(re, im):
        return re.astype(dtype), im.astype(dtype)

    # Forward y: B = A @ Wy -> [C, X, J]
    dn_y = (((2,), (0,)), ((), ()))
    Bre, Bim = _complex_dot(A_re, A_im, wyre_ref[:], wyim_ref[:], dn_y)
    Bre, Bim = cast(Bre, Bim)
    # Forward x: F = B (contract X) Wx -> [C, J, I]
    dn_x = (((1,), (0,)), ((), ()))
    Fre, Fim = _complex_dot(Bre, Bim, wxre_ref[:], wxim_ref[:], dn_x)
    # Coupling: G = sum_c H * conj(F)  (H is the coupled rec spectrum).
    Hre = hre_ref[0].astype(f32)       # [C, J, I]
    Him = him_ref[0].astype(f32)
    Gre = (Hre * Fre + Him * Fim).sum(axis=0)   # [J, I]
    Gim = (Him * Fre - Hre * Fim).sum(axis=0)
    Gre, Gim = cast(Gre, Gim)
    # Inverse x: C = G @ Ux -> [J, X']
    dn_i = (((1,), (0,)), ((), ()))
    Cre, Cim = _complex_dot(Gre, Gim, uxre_ref[:], uxim_ref[:], dn_i)
    Cre, Cim = cast(Cre, Cim)
    # Inverse y (contract J, the leading dim): D -> [X', Y']
    dn_j = (((0,), (0,)), ((), ()))
    Dre, Dim = _complex_dot(Cre, Cim, uyre_ref[:], uyim_ref[:], dn_j)
    dre_ref[0, 0] = Dre
    dim_ref[0, 0] = Dim


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_correlate(Are: jax.Array, Aim: jax.Array,
                    Hre: jax.Array, Him: jax.Array,
                    WyRe: jax.Array, WyIm: jax.Array,
                    WxRe: jax.Array, WxIm: jax.Array,
                    UxRe: jax.Array, UxIm: jax.Array,
                    UyRe: jax.Array, UyIm: jax.Array,
                    interpret: bool = False):
    """Fused (forward-y/x, coupling, inverse-x/y).

    Args (layouts chosen so every dot has a 128-wide minor):
      Are/Aim: ``[b, K, C, X, Y]`` z-transformed ligand volumes;
      Hre/Him: ``[K, C, J, I]`` coupled receptor spectrum, transposed
        by ``DFTCorrelator.prep_H`` (off the hot path);
      WyRe/WyIm ``[Y, J]``; WxRe/WxIm ``[X, I]``; UxRe/UxIm ``[I, X']``;
      UyRe/UyIm ``[J, Y']``.
    Returns (Dre, Dim) ``[b, K, X', Y']`` float32 — apply the Hermitian
    kz->z contraction outside to get real score volumes.
    """
    b, K, C, X, Y = Are.shape
    J = WyRe.shape[1]
    I = WxRe.shape[1]
    Xp = UxRe.shape[1]
    Yp = UyRe.shape[1]
    grid = (K, b)  # b innermost: H[k] tile reused across the chunk

    def a_spec():
        return pl.BlockSpec((1, 1, C, X, Y),
                            lambda k, bb: (bb, k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def h_spec():
        return pl.BlockSpec((1, C, J, I), lambda k, bb: (k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(r, c):
        return pl.BlockSpec((r, c), lambda k, bb: (0, 0),
                            memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec((1, 1, Xp, Yp), lambda k, bb: (bb, k, 0, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((b, K, Xp, Yp), jnp.float32)] * 2
    flops_per = (2 * C * X * Y * J + 2 * C * J * X * I
                 + 2 * J * I * Xp + 2 * J * Xp * Yp) * 4
    cost = pl.CostEstimate(
        flops=flops_per * K * b,
        bytes_accessed=(Are.size + Aim.size) * Are.dtype.itemsize
        + (Hre.size + Him.size) * Hre.dtype.itemsize
        + 2 * b * K * Xp * Yp * 4,
        transcendentals=0)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[a_spec(), a_spec(), h_spec(), h_spec(),
                  w_spec(Y, J), w_spec(Y, J), w_spec(X, I), w_spec(X, I),
                  w_spec(I, Xp), w_spec(I, Xp), w_spec(J, Yp),
                  w_spec(J, Yp)],
        out_specs=[out_spec(), out_spec()],
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(Are, Aim, Hre, Him, WyRe, WyIm, WxRe, WxIm, UxRe, UxIm,
      UyRe, UyIm)
