"""Training-batch assembly: complexes -> padded TrainBatch with decoys.

Bridges the host-side dataset (data/benchmark.py) and the jitted train
step: picks complexes, centers receptor/ligand, snaps the native shift
to the voxel lattice, samples labeled decoy sets (train/decoys.py), and
pads atom counts so the batch has static shapes.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.data.benchmark import (
    Complex, structure_to_device,
)
from deeplocalproteindocking_tpu.train.decoys import generate_decoys
from deeplocalproteindocking_tpu.train.trainer import TrainBatch


def native_voxel_shift(cplx: Complex, resolution: float) -> np.ndarray:
    """Native ligand placement as an integer voxel shift (see decoys.py)."""
    t = (cplx.ligand.center - cplx.receptor.center) / resolution
    return np.round(t).astype(np.int32)


def make_training_batch(key: jax.Array,
                        complexes: Sequence[Complex],
                        cfg: DockConfig,
                        max_atoms: int | None = None) -> TrainBatch:
    """Sample ``cfg.batch_complexes`` complexes and their decoy sets."""
    if max_atoms is None:
        max_atoms = max(max(len(c.receptor.typed()), len(c.ligand.typed()))
                        for c in complexes)
    if cfg.sweep_mode == "resplat":
        from deeplocalproteindocking_tpu.train.scoring_path import (
            train_lig_grid)
        half_box = 0.5 * train_lig_grid(cfg) * cfg.resolution
        for c in complexes:
            lig = c.ligand.centered()
            extent = float(np.abs(lig.coords).max()) + 3.0 * cfg.sigma
            if extent > half_box:
                raise ValueError(
                    f"ligand of {c.name} (extent {extent:.1f} A) exceeds "
                    f"the training ligand box ({half_box:.1f} A half-"
                    f"width); raise config.lig_grid_size")
    k_pick, key = jax.random.split(key)
    idx = jax.random.randint(k_pick, (cfg.batch_complexes,), 0,
                             len(complexes))
    rows = {f: [] for f in TrainBatch._fields}
    for j, i in enumerate(np.asarray(idx)):
        cplx = complexes[int(i)]
        rc, rt, rm = structure_to_device(cplx.receptor.centered(),
                                         max_atoms)
        lc, lt, lm = structure_to_device(cplx.ligand.centered(), max_atoms)
        nat_f = (cplx.ligand.center - cplx.receptor.center) / cfg.resolution
        if cfg.augment_rotations:
            # Joint rotation of the whole complex: the reference's EQ
            # models get rotational robustness from augmentation, not
            # architecture.  Rotating (rec, lig, native shift) together
            # preserves all LRMSD labels exactly.
            key, k_r = jax.random.split(key)
            from deeplocalproteindocking_tpu.structure.transforms import (
                random_rotations, rotate)
            R0 = random_rotations(k_r, 1)[0]
            rc = rotate(rc, R0) * rm[:, None]
            lc = rotate(lc, R0) * lm[:, None]
            nat_f = np.asarray(R0) @ np.asarray(nat_f)
        nat = jnp.asarray(np.round(np.asarray(nat_f)).astype(np.int32))
        key, k_d = jax.random.split(key)
        dec = generate_decoys(
            k_d, lc, lm, nat, n=cfg.num_decoys,
            resolution=cfg.resolution,
            max_angle=float(np.deg2rad(cfg.decoy_max_angle_deg)),
            max_shift=cfg.decoy_max_shift)
        for f, v in zip(TrainBatch._fields,
                        (rc, rt, rm, lc, lt, lm,
                         dec.rotations, dec.shifts, dec.lrmsd)):
            rows[f].append(v)
    return TrainBatch(**{f: jnp.stack(v) for f, v in rows.items()})
