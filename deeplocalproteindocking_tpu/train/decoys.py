"""Decoy pose generation for local-docking representation training.

Capability parity with the reference's decoy-generation scripts
[U: DeepLocalProteinDocking/Dataset — mount empty, unverified]: sample
rigid perturbations of the native ligand pose (rotations within a cone,
translations near the native placement) and label each decoy with its
ligand RMSD, so the trainer can rank near-native poses above decoys.

Geometry convention (shared with the whole framework):

* receptor coords centered at the origin; ligand coords centered at the
  ligand's own center; the native pose is ``(I, t_nat)`` with
  ``t_nat = center(lig) - center(rec)`` from the bound complex;
* a pose ``(R, s)`` places the ligand at ``R x + s * resolution`` for
  centered ligand coords x, with ``s`` an *integer voxel shift* — decoy
  translations live on the correlation lattice so training scores are
  exact gathers from the FFT score volume (SURVEY.md §3.2 option (a)).
  The native shift is snapped to the nearest voxel (sub-voxel error
  <= resolution/2, below the near-native LRMSD threshold).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.structure.so3 import local_rotations
from deeplocalproteindocking_tpu.structure.transforms import apply_pose
from deeplocalproteindocking_tpu.utils.rmsd import rmsd


class DecoySet(NamedTuple):
    rotations: jax.Array   # [D, 3, 3]
    shifts: jax.Array      # [D, 3] int32 voxel shifts
    lrmsd: jax.Array       # [D] float32 quality labels (Angstrom)


def generate_decoys(key: jax.Array,
                    lig_coords: jax.Array,
                    lig_mask: jax.Array,
                    native_shift: jax.Array,
                    *,
                    n: int,
                    resolution: float,
                    max_angle: float,
                    max_shift: float,
                    include_native: bool = True) -> DecoySet:
    """Sample ``n`` decoys around the native pose and label by LRMSD.

    ``lig_coords [N, 3]`` are centered ligand coords, ``native_shift
    [3]`` the native voxel shift (int).  ``max_angle`` (radians) bounds
    the rotation cone; ``max_shift`` (Angstrom) bounds the translation
    perturbation.  When ``include_native``, decoy 0 is the native pose
    itself (the ranking loss needs at least one near-native).
    """
    k_rot, k_t = jax.random.split(key)
    eye = jnp.eye(3, dtype=jnp.float32)
    Rs = local_rotations(eye, max_angle, n, key=k_rot)
    max_vox = max(1, int(round(max_shift / resolution)))
    dt = jax.random.randint(k_t, (n, 3), -max_vox, max_vox + 1)
    shifts = native_shift[None].astype(jnp.int32) + dt.astype(jnp.int32)
    if include_native:
        Rs = Rs.at[0].set(eye)
        shifts = shifts.at[0].set(native_shift.astype(jnp.int32))

    native_pose = lig_coords + native_shift.astype(jnp.float32) * resolution
    posed = apply_pose(lig_coords[None], Rs,
                       shifts.astype(jnp.float32) * resolution)
    lrmsd = rmsd(posed, native_pose[None],
                 jnp.broadcast_to(lig_mask[None], posed.shape[:-1]))
    return DecoySet(rotations=Rs, shifts=shifts, lrmsd=lrmsd)


def generate_global_decoys(key: jax.Array,
                           lig_coords: jax.Array,
                           lig_mask: jax.Array,
                           native_shift: jax.Array,
                           *,
                           n: int,
                           resolution: float,
                           max_shift_vox: int) -> DecoySet:
    """Uniform GLOBAL decoys: full SO(3) rotations x box-wide shifts.

    Local decoys (``generate_decoys``) teach a model to rank within a
    cone — a model trained only on them scores arbitrary far-away poses
    out of distribution and loses the *global* docking benchmark (the
    round-1 README matrix: learned-global 0.0 top-1 vs shape's 0.5).
    Global negatives make every pose in the searchable box in-
    distribution.  ``max_shift_vox`` should keep the shifted ligand
    inside the box (no wrap-aliased labels): typically
    ``grid//2 - ligand_half_extent_vox``.
    """
    from deeplocalproteindocking_tpu.structure.transforms import (
        random_rotations)
    k_rot, k_t = jax.random.split(key)
    Rs = random_rotations(k_rot, n)
    shifts = jax.random.randint(
        k_t, (n, 3), -max_shift_vox, max_shift_vox + 1).astype(jnp.int32)
    native_pose = lig_coords + native_shift.astype(jnp.float32) * resolution
    posed = apply_pose(lig_coords[None], Rs,
                       shifts.astype(jnp.float32) * resolution)
    lrmsd = rmsd(posed, native_pose[None],
                 jnp.broadcast_to(lig_mask[None], posed.shape[:-1]))
    return DecoySet(rotations=Rs, shifts=shifts, lrmsd=lrmsd)
