"""Stage-ablation profiling of the resplat sweep ON THE REAL CHIP.

Round 1's stage numbers came from standalone jits, which don't sum to
the fused-scan cost (XLA fuses across stages).  This tool measures each
stage *in context* by running the real scan with the pipeline truncated
after stage k (reducing whatever tensor exists at that point to a
scalar so nothing downstream runs), and reporting deltas.

Usage: python tools/profile_sweep.py [n_probe_rotations]
Env: PROF_GRID, PROF_CHUNK, PROF_DTYPE, PROF_LIG_GRID.
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


def build(grid, chunk, dft_dtype):
    cfg = DockConfig(grid_size=grid, resolution=1.25,
                     rep_features=(32, 32, 16), rotation_chunk=chunk,
                     top_k=64, fft_impl="dft", dft_dtype=dft_dtype)
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
    lig_grid = int(os.environ.get("PROF_LIG_GRID", 0)) or auto_ligand_grid(
        lig_c.typed().coords, cfg.resolution, cfg.sigma,
        pipe._receptive_field(), cfg.grid_size)
    rep_fn = pipe._ligand_rep_fn()
    return cfg, H, lc, lt, lm, lig_grid, rep_fn


def make_scan(stage, H, lc, lt, lm, rep_fn, *, grid, lig_grid, res, sigma,
              chunk, dft_dtype, top_k):
    """Scan truncated after `stage`.  Carry is a running scalar sum so
    every kept stage's output is consumed (nothing DCEs)."""
    L = grid
    corr = get_correlator(L, lig_grid, dft_dtype)
    Hre = H.real.astype(jnp.float32)
    Him = H.imag.astype(jnp.float32)
    fused = os.environ.get("PROF_FUSED", "0") == "1"
    # Eager, outside the jit: H is complex64 and the axon platform
    # cannot transfer complex64 to host for constant embedding.
    HtRe, HtIm = corr.prep_H(H) if fused else (None, None)

    @functools.partial(jax.jit, static_argnames=())
    def run(rotations):
        n_steps = rotations.shape[0] // chunk
        rot_chunks = rotations.reshape(n_steps, chunk, 3, 3)

        def splat_one(coords_r):
            return separable_splat(coords_r, lt, lm, grid_size=lig_grid,
                                   resolution=res, sigma=sigma,
                                   num_types=11)

        def step(carry, Rc):
            acc, ts, tr, tf = carry
            coords_r = jnp.einsum("bij,nj->bni", Rc, lc)
            if stage == "rotate":
                return (acc + coords_r.sum(), ts, tr, tf), None
            vols = jax.vmap(splat_one)(coords_r)
            if stage == "splat":
                return (acc + vols.sum(), ts, tr, tf), None
            reps = rep_fn(vols)
            if stage == "cnn":
                return (acc + reps.sum(), ts, tr, tf), None
            f32 = jnp.float32
            if fused:
                from deeplocalproteindocking_tpu.correlate.pallas_fused \
                    import fused_correlate
                v = reps.astype(corr.dtype)
                WzRe, WzIm, WyRe, WyIm, WxRe, WxIm = corr._cast(
                    corr.WzRe, corr.WzIm, corr.WyRe, corr.WyIm,
                    corr.WxRe, corr.WxIm)
                UxRe, UxIm, UyRe, UyIm, MzRe, MzIm = corr._cast(
                    corr.UxRe, corr.UxIm, corr.UyRe, corr.UyIm,
                    corr.MzRe, corr.MzIm)
                are = jnp.einsum("bxyzc,zk->bkcxy", v, WzRe,
                                 preferred_element_type=f32)
                aim = jnp.einsum("bxyzc,zk->bkcxy", v, WzIm,
                                 preferred_element_type=f32)
                are, aim = corr._cast(are, aim)
                if stage == "zpass":
                    return (acc + are.sum() + aim.sum(), ts, tr, tf), None
                Dre, Dim = fused_correlate(
                    are, aim, HtRe, HtIm, WyRe, WyIm, WxRe, WxIm,
                    UxRe, UxIm, UyRe, UyIm)
                if stage == "kernel":
                    return (acc + Dre.sum() + Dim.sum(), ts, tr, tf), None
                if stage == "fusedtopk":
                    # Production tail (round 4): fused inverse-z +
                    # block-max kernel + drill-down exact top-K — the
                    # score volume never reaches HBM.
                    from deeplocalproteindocking_tpu.correlate.\
                        pallas_invz_topk import drill_topk, invz_blockmax
                    Mre = jnp.asarray(corr.MzRe, f32)
                    Mim = jnp.asarray(corr.MzIm, f32)
                    bias = jnp.zeros((L, L, L), f32)
                    bmax = invz_blockmax(Dre, Dim, Mre, Mim, bias)
                    vals, flat = drill_topk(Dre, Dim, Mre, Mim, None,
                                            bmax, top_k)
                    new_ts = jnp.concatenate([ts, vals.reshape(-1)])
                    new_tr = jnp.concatenate(
                        [tr, jnp.zeros(vals.size, jnp.int32)])
                    new_tf = jnp.concatenate([tf, flat.reshape(-1)])
                    best, sel = jax.lax.top_k(new_ts, top_k)
                    return (acc, best, new_tr[sel], new_tf[sel]), None
                S = (jnp.einsum("bkxy,kz->bxyz", Dre, MzRe,
                                preferred_element_type=f32)
                     - jnp.einsum("bkxy,kz->bxyz", Dim, MzIm,
                                  preferred_element_type=f32))
                if stage == "inverse":
                    return (acc + S.sum(), ts, tr, tf), None
                from deeplocalproteindocking_tpu.sweep.topk import (
                    exact_block_topk)
                vals, flat = exact_block_topk(
                    S.reshape(chunk, L * L * L), top_k)
                new_ts = jnp.concatenate([ts, vals.reshape(-1)])
                new_tr = jnp.concatenate(
                    [tr, jnp.zeros(vals.size, jnp.int32)])
                new_tf = jnp.concatenate(
                    [tf, flat.reshape(-1).astype(jnp.int32)])
                best, sel = jax.lax.top_k(new_ts, top_k)
                return (acc, best, new_tr[sel], new_tf[sel]), None
            fre, fim = corr.ligand_spectrum(reps)
            if stage == "fwd":
                return (acc + fre.sum() + fim.sum(), ts, tr, tf), None
            gre = (jnp.einsum("ijkc,bijkc->bijk", Hre, fre,
                              preferred_element_type=f32)
                   + jnp.einsum("ijkc,bijkc->bijk", Him, fim,
                                preferred_element_type=f32))
            gim = (jnp.einsum("ijkc,bijkc->bijk", Him, fre,
                              preferred_element_type=f32)
                   - jnp.einsum("ijkc,bijkc->bijk", Hre, fim,
                                preferred_element_type=f32))
            if stage == "couple":
                return (acc + gre.sum() + gim.sum(), ts, tr, tf), None
            S = corr.inverse(gre, gim)
            if stage == "inverse":
                return (acc + S.sum(), ts, tr, tf), None
            vals, flat = jax.lax.top_k(S.reshape(chunk, L * L * L), top_k)
            new_ts = jnp.concatenate([ts, vals.reshape(-1)])
            new_tr = jnp.concatenate(
                [tr, jnp.zeros(vals.size, jnp.int32)])
            new_tf = jnp.concatenate(
                [tf, flat.reshape(-1).astype(jnp.int32)])
            best, sel = jax.lax.top_k(new_ts, top_k)
            return (acc, best, new_tr[sel], new_tf[sel]), None

        init = (jnp.zeros((), jnp.float32),
                jnp.full((top_k,), -jnp.inf, jnp.float32),
                jnp.zeros((top_k,), jnp.int32),
                jnp.zeros((top_k,), jnp.int32))
        carry, _ = jax.lax.scan(step, init, rot_chunks)
        return carry[0] + carry[1].sum()

    return run


def main():
    grid = int(os.environ.get("PROF_GRID", 128))
    chunk = int(os.environ.get("PROF_CHUNK", 16))
    dft_dtype = os.environ.get("PROF_DTYPE", "float32")
    n_rot = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    cfg, H, lc, lt, lm, lig_grid, rep_fn = build(grid, chunk, dft_dtype)
    print(f"grid={grid} lig_grid={lig_grid} chunk={chunk} "
          f"dtype={dft_dtype} n_rot={n_rot} "
          f"device={jax.devices()[0]}", file=sys.stderr)
    rots = super_fibonacci_rotations((n_rot // chunk) * chunk)
    n = rots.shape[0]

    if os.environ.get("PROF_FUSED", "0") == "1":
        stages = ["rotate", "splat", "cnn", "zpass", "kernel",
                  "fusedtopk"]
        if os.environ.get("PROF_OLDTAIL", "0") == "1":
            stages = stages[:-1] + ["inverse", "topk"]
    else:
        stages = ["rotate", "splat", "cnn", "fwd", "couple", "inverse",
                  "topk"]
    prev = 0.0
    for st in stages:
        run = make_scan(st, H, lc, lt, lm, rep_fn, grid=grid,
                        lig_grid=lig_grid, res=cfg.resolution,
                        sigma=cfg.sigma, chunk=chunk, dft_dtype=dft_dtype,
                        top_k=64)
        out = run(rots); float(np.asarray(out))       # compile+sync
        t0 = time.perf_counter()
        out = run(rots); float(np.asarray(out))
        dt = time.perf_counter() - t0
        ms = dt / n * 1e3
        print(f"{st:>8}: {ms:7.3f} ms/rot  (+{ms - prev:6.3f})")
        prev = ms


if __name__ == "__main__":
    main()
