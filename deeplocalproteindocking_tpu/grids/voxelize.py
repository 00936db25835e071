"""Differentiable atom-to-grid Gaussian density splatting.

Capability parity with the reference's ``TypedCoords2Volume`` CUDA kernel
[U: TorchProteinLibrary/Layers/Volume/TypedCoords2Volume/Kernels.cu —
mount empty, unverified]: each heavy atom deposits a truncated Gaussian
``exp(-r^2 / 2 sigma^2)`` into the channel of its chemical type, and the
op is differentiable w.r.t. atom coordinates (the "grads through
voxelizer" requirement in BASELINE.json: north_star).

TPU-native design, deliberately different from the CUDA original:

* The CUDA kernel parallelizes over atoms and uses ``atomicAdd`` into the
  grid — fast but **nondeterministic** in the backward.  Here the forward
  is a single XLA ``scatter-add`` over precomputed per-atom local
  windows: each atom contributes a separable ``W^3`` Gaussian patch whose
  weights are an outer product of three 1-D Gaussians (``O(N W)``
  transcendentals, not ``O(N W^3)``).  XLA scatter-add on TPU is
  deterministic, so double runs are bitwise identical (asserted in
  tests — SURVEY.md §5.2).
* The backward needs no custom kernel at all: window *indices* are
  ``stop_gradient``-ed integers, the weights are smooth functions of the
  coordinates, and autodiff of scatter-add is a gather — exactly the
  "gather of grid-gradient x Gaussian spatial gradient" the reference
  hand-writes in CUDA.
* Volumes are channels-last ``[L, L, L, T]`` so the downstream 3-D conv
  lands on the MXU with the channel dim on lanes.

A Pallas tiled-accumulation kernel is the planned upgrade if the scatter
profiles hot; the splat is off the sweep hot path (once per complex vs
~10^4 FFT rotations), so pure XLA is the right first implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def default_origin(grid_size: int, resolution: float) -> jnp.ndarray:
    """Origin (corner of voxel 0) that centers the box on coordinate 0."""
    half = 0.5 * grid_size * resolution
    return jnp.array([-half, -half, -half], dtype=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("grid_size", "resolution", "sigma", "window",
                     "num_types"),
)
def splat(coords: jax.Array,
          types: jax.Array,
          mask: jax.Array | None = None,
          *,
          grid_size: int = 128,
          resolution: float = 1.25,
          sigma: float = 1.0,
          window: int = 6,
          num_types: int = 11,
          origin: jax.Array | None = None) -> jax.Array:
    """Splat ``coords [N, 3]`` with ``types [N]`` into ``[L, L, L, T]``.

    ``mask`` marks real atoms (padding rows excluded); atoms with type
    ``< 0`` are excluded as well.  Differentiable w.r.t. ``coords``.
    Voxel ``i`` is centered at ``origin + (i + 0.5) * resolution``.
    """
    L, W, T = grid_size, window, num_types
    if origin is None:
        origin = default_origin(L, resolution)
    if mask is None:
        mask = jnp.ones(coords.shape[:-1], dtype=jnp.float32)
    mask = mask.astype(coords.dtype) * (types >= 0).astype(coords.dtype)
    tsafe = jnp.clip(types, 0, T - 1).astype(jnp.int32)

    # Position in voxel units; voxel centers sit at half-integers + 0.5.
    g = (coords - origin) / resolution - 0.5          # [N, 3]
    base = jnp.floor(g).astype(jnp.int32) - (W // 2 - 1)
    base = jax.lax.stop_gradient(base)                # [N, 3]
    offs = jnp.arange(W, dtype=jnp.int32)             # [W]

    def axis_terms(axis):
        idx = base[:, axis, None] + offs[None, :]     # [N, W]
        d = (idx.astype(g.dtype) - g[:, axis, None]) * resolution
        w = jnp.exp(-(d * d) / (2.0 * sigma * sigma))
        valid = (idx >= 0) & (idx < L)
        w = jnp.where(valid, w, 0.0)
        return jnp.clip(idx, 0, L - 1), w

    ix, wx = axis_terms(0)
    iy, wy = axis_terms(1)
    iz, wz = axis_terms(2)

    # Separable outer product -> [N, W, W, W] weights.
    w = (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :])
    w = w * mask[:, None, None, None]

    flat = (((ix[:, :, None, None] * L + iy[:, None, :, None]) * L
             + iz[:, None, None, :]) * T + tsafe[:, None, None, None])

    grid = jnp.zeros((L * L * L * T,), dtype=coords.dtype)
    grid = grid.at[flat.reshape(-1)].add(w.reshape(-1))
    return grid.reshape(L, L, L, T)


@functools.partial(
    jax.jit,
    static_argnames=("grid_size", "resolution", "sigma", "num_types",
                     "atom_chunk"),
)
def separable_splat(coords: jax.Array,
                    types: jax.Array,
                    mask: jax.Array | None = None,
                    *,
                    grid_size: int = 64,
                    resolution: float = 1.25,
                    sigma: float = 1.0,
                    num_types: int = 11,
                    origin: jax.Array | None = None,
                    atom_chunk: int | None = None) -> jax.Array:
    """Matmul-formulated Gaussian splat: no scatter, no gather.

    The Gaussian is separable, so the density factorizes per axis:

        D[x, y, z, t] = sum_a Px[a, x] * Py[a, y] * Pz[a, z] * 1[type_a = t]

    computed as one MXU contraction: ``U[a, (y,z)] = Py odot Pz`` then
    ``D[(y,z), (x,t)] = U^T @ (Px odot onehot)``.  This is the TPU
    answer to the reference's CUDA atom-scatter kernel for the *hot*
    path (per-rotation ligand re-splat in the resplat sweep mode): dense
    profiles keep everything on the MXU/VPU, the output is exact (full
    support — no window truncation), deterministic, and differentiable
    w.r.t. coords through the profile exponentials.

    Intended for small boxes (ligand-sized, L <= 64): the intermediate
    ``U`` is ``[N, L^2]``.  For the big receptor box use :func:`splat`
    (scatter version, off the hot path).
    """
    L, T = grid_size, num_types
    if origin is None:
        origin = default_origin(L, resolution)
    if mask is None:
        mask = jnp.ones(coords.shape[:-1], dtype=coords.dtype)
    mask = mask.astype(coords.dtype) * (types >= 0).astype(coords.dtype)
    tsafe = jnp.clip(types, 0, T - 1)

    def contract(coords_c, tsafe_c, mask_c):
        g = (coords_c - origin) / resolution - 0.5    # voxel-unit centers
        centers = jnp.arange(L, dtype=coords_c.dtype)
        d = (g[:, :, None] - centers[None, None, :]) * resolution
        prof = jnp.exp(-(d * d) / (2.0 * sigma * sigma))   # [n, 3, L]
        px, py, pz = prof[:, 0], prof[:, 1], prof[:, 2]
        px = px * mask_c[:, None]
        onehot = jax.nn.one_hot(tsafe_c, T, dtype=coords_c.dtype)
        # W[a, x, t] = Px * onehot ; U[a, y, z] = Py * Pz
        W = px[:, :, None] * onehot[:, None, :]            # [n, L, T]
        U = py[:, :, None] * pz[:, None, :]                # [n, L, L]
        return jnp.einsum("ayz,axt->xyzt", U, W,
                          preferred_element_type=jnp.float32)

    n = coords.shape[0]
    if atom_chunk is None or n <= atom_chunk:
        return contract(coords, tsafe, mask)

    # Bound the [n, L^2] intermediate on big grids: scan over atom
    # chunks, accumulating the density.
    pad = (-n) % atom_chunk
    coords_p = jnp.pad(coords, ((0, pad), (0, 0)))
    tsafe_p = jnp.pad(tsafe, (0, pad))
    mask_p = jnp.pad(mask, (0, pad))
    nc = coords_p.shape[0] // atom_chunk

    def body(acc, inp):
        c, t, m = inp
        return acc + contract(c, t, m), None

    init = jnp.zeros((L, L, L, T), dtype=jnp.float32)
    out, _ = jax.lax.scan(
        body, init,
        (coords_p.reshape(nc, atom_chunk, 3),
         tsafe_p.reshape(nc, atom_chunk),
         mask_p.reshape(nc, atom_chunk)))
    return out
