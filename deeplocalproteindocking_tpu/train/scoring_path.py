"""Shared decoy-scoring forward pass for training.

One function used by both the single-device Trainer and the multi-chip
parallel step, dispatching on ``config.sweep_mode`` so training scores
poses with EXACTLY the same model definition the docking sweep uses:

* ``resplat``  — rotate atom coords, matmul-splat on the ligand box,
  CNN, FFT gather (sweep/resplat.py).  Gradients flow through the
  voxelizer for real (coords -> density -> rep -> score).
* ``resample`` — reference-style: rotate the ligand representation
  volume, FFT gather.
"""
from __future__ import annotations

import jax

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.correlate.fft import (
    coupled_receptor, receptor_transform, resolve_engine, score_at,
)
from deeplocalproteindocking_tpu.grids.rotate import rotate_volume
from deeplocalproteindocking_tpu.grids.voxelize import separable_splat
from deeplocalproteindocking_tpu.sweep.resplat import score_decoys_resplat


def train_lig_grid(cfg: DockConfig) -> int:
    """Static ligand-box size for training (shapes must not depend on
    data inside jit); data_gen validates ligands fit."""
    return cfg.lig_grid_size or max(16, cfg.grid_size // 2)


def complex_scores(model, cfg: DockConfig, params,
                   rec_c, rec_t, rec_m, lig_c, lig_t, lig_m,
                   d_rot, d_shift) -> jax.Array:
    """Scores ``[D]`` of one complex's decoy set (differentiable)."""
    kw = dict(grid_size=cfg.grid_size, resolution=cfg.resolution,
              sigma=cfg.sigma, num_types=cfg.num_atom_types,
              atom_chunk=4096 if rec_c.shape[0] > 4096 else None)
    rec_vol = separable_splat(rec_c, rec_t, rec_m, **kw)

    if cfg.sweep_mode == "resplat":
        rep_rec = model.apply({"params": params}, rec_vol,
                              method=model.represent)
        impl = resolve_engine(cfg.fft_impl, cfg.grid_size)
        H = coupled_receptor(rep_rec, params["coupling"], impl)

        def rep_fn(vols):
            return model.apply({"params": params}, vols,
                               method=model.represent)

        return score_decoys_resplat(
            H, lig_c, lig_t, lig_m, d_rot, d_shift, rep_fn,
            grid_size=cfg.grid_size, lig_grid=train_lig_grid(cfg),
            resolution=cfg.resolution, sigma=cfg.sigma,
            num_types=cfg.num_atom_types, fft_impl=impl,
            dft_dtype=cfg.dft_dtype, fft_block=cfg.fft_block)

    lig_vol = separable_splat(lig_c, lig_t, lig_m, **kw)
    rep_rec, rep_lig, coupling = model.apply(
        {"params": params}, rec_vol, lig_vol)
    H = receptor_transform(rep_rec, coupling)

    @jax.checkpoint
    def score_one(args):
        R, s = args
        return score_at(H, rotate_volume(rep_lig, R), s[None])[0]

    return jax.lax.map(score_one, (d_rot, d_shift))
