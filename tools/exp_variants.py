"""Measure full-scan ms/rotation for candidate optimizations.

Usage: python tools/exp_variants.py [n_rot] [variant ...]
Variants: base, blocktopk, bf16dft, bf16cnn, chunk32, all
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.correlate.dft import get_correlator
from deeplocalproteindocking_tpu.correlate.fft import receptor_transform
from deeplocalproteindocking_tpu.data import synthetic_complex
from deeplocalproteindocking_tpu.data.benchmark import structure_to_device
from deeplocalproteindocking_tpu.grids.voxelize import separable_splat
from deeplocalproteindocking_tpu.pipeline import DockingPipeline
from deeplocalproteindocking_tpu.structure.so3 import super_fibonacci_rotations
from deeplocalproteindocking_tpu.sweep.topk import exact_block_topk


def build(grid, chunk, dft_dtype, cnn_dtype):
    cfg = DockConfig(grid_size=grid, resolution=1.25,
                     rep_features=(32, 32, 16), rotation_chunk=chunk,
                     top_k=64, fft_impl="dft", dft_dtype=dft_dtype,
                     compute_dtype=cnn_dtype)
    pipe = DockingPipeline(config=cfg)
    params = pipe.init_params(seed=0)
    cplx = synthetic_complex(seed=0, n_res_rec=60, n_res_lig=30)
    rec_vol = pipe.voxelize(cplx.receptor.centered())
    rep_rec = pipe.model.apply({"params": params}, rec_vol,
                               method=pipe.model.represent)
    H = receptor_transform(rep_rec, params["coupling"])
    lig_c = cplx.ligand.centered()
    lc, lt, lm = structure_to_device(lig_c)
    from deeplocalproteindocking_tpu.sweep.resplat import auto_ligand_grid
    lig_grid = auto_ligand_grid(lig_c.typed().coords, cfg.resolution,
                                cfg.sigma, pipe._receptive_field(),
                                cfg.grid_size)
    rep_fn = pipe._ligand_rep_fn()
    return cfg, H, lc, lt, lm, lig_grid, rep_fn


def make_run(H, lc, lt, lm, rep_fn, *, grid, lig_grid, res, sigma,
             chunk, dft_dtype, top_k, topk_kind, fft_kind="einsum"):
    L = grid
    corr = get_correlator(L, lig_grid, dft_dtype)
    Hre = H.real.astype(jnp.float32)
    Him = H.imag.astype(jnp.float32)
    HtRe, HtIm = corr.prep_H(H)

    @jax.jit
    def run(rotations):
        n_steps = rotations.shape[0] // chunk
        rot_chunks = rotations.reshape(n_steps, chunk, 3, 3)
        base_ids = jnp.arange(n_steps, dtype=jnp.int32) * chunk

        def splat_one(coords_r):
            return separable_splat(coords_r, lt, lm, grid_size=lig_grid,
                                   resolution=res, sigma=sigma,
                                   num_types=11)

        def step(carry, inp):
            c_scores, c_rot, c_flat = carry
            Rc, base = inp
            coords_r = jnp.einsum("bij,nj->bni", Rc, lc)
            vols = jax.vmap(splat_one)(coords_r)
            reps = rep_fn(vols)
            if fft_kind == "fused":
                S = corr.scores_fused(HtRe, HtIm, reps)
            else:
                S = corr.scores(Hre, Him, reps)
            Sf = S.reshape(chunk, L * L * L)
            if topk_kind == "block":
                vals, flat = exact_block_topk(Sf, top_k, block=32)
            else:
                vals, flat = jax.lax.top_k(Sf, top_k)
            rot_ids = base + jnp.arange(chunk, dtype=jnp.int32)
            rot_ids = jnp.broadcast_to(rot_ids[:, None], vals.shape)
            all_s = jnp.concatenate([c_scores, vals.reshape(-1)])
            all_r = jnp.concatenate([c_rot, rot_ids.reshape(-1)])
            all_f = jnp.concatenate(
                [c_flat, flat.reshape(-1).astype(jnp.int32)])
            best, sel = jax.lax.top_k(all_s, top_k)
            return (best, all_r[sel], all_f[sel]), None

        init = (jnp.full((top_k,), -jnp.inf, jnp.float32),
                jnp.zeros((top_k,), jnp.int32),
                jnp.zeros((top_k,), jnp.int32))
        (s, r, f), _ = jax.lax.scan(step, init, (rot_chunks, base_ids))
        return s, r, f

    return run


VARIANTS = {
    "base":      dict(chunk=16, dft="float32", cnn="float32", topk="lax"),
    "blocktopk": dict(chunk=16, dft="float32", cnn="float32", topk="block"),
    "bf16dft":   dict(chunk=16, dft="bfloat16", cnn="float32", topk="lax"),
    "bf16cnn":   dict(chunk=16, dft="float32", cnn="bfloat16", topk="lax"),
    "chunk32":   dict(chunk=32, dft="float32", cnn="float32", topk="lax"),
    "all":       dict(chunk=16, dft="bfloat16", cnn="bfloat16",
                      topk="block"),
    "all32":     dict(chunk=32, dft="bfloat16", cnn="bfloat16",
                      topk="block"),
    "fused":     dict(chunk=16, dft="float32", cnn="float32",
                      topk="block", fft="fused"),
    "fusedbf16": dict(chunk=16, dft="bfloat16", cnn="float32",
                      topk="block", fft="fused"),
}


def main():
    n_rot = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    names = sys.argv[2:] or list(VARIANTS)
    for name in names:
        v = VARIANTS[name]
        cfg, H, lc, lt, lm, lig_grid, rep_fn = build(
            128, v["chunk"], v["dft"], v["cnn"])
        run = make_run(H, lc, lt, lm, rep_fn, grid=128,
                       lig_grid=lig_grid, res=cfg.resolution,
                       sigma=cfg.sigma, chunk=v["chunk"],
                       dft_dtype=v["dft"], top_k=64, topk_kind=v["topk"],
                       fft_kind=v.get("fft", "einsum"))
        n = (n_rot // v["chunk"]) * v["chunk"]
        rots = super_fibonacci_rotations(n)
        out = run(rots); np.asarray(out[0])
        t0 = time.perf_counter()
        out = run(rots); s = np.asarray(out[0])
        dt = time.perf_counter() - t0
        print(f"{name:>10}: {dt / n * 1e3:7.3f} ms/rot   "
              f"top1={s[0]:.3f}  (13k -> {dt / n * 13000:.1f} s)")


if __name__ == "__main__":
    main()
