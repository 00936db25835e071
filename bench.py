"""Headline benchmark: per-complex full SO(3) x T docking sweep.

Target (BASELINE.md, driver-written north star): a full ~13k-rotation x
128^3-translation sweep per complex in < 10 s on TPU.  This script runs
the real flagship path — 11-type splat -> 3D-CNN representation ->
per-rotation trilinear resample -> FFT correlation -> streaming top-K —
on one synthetic complex, times the steady-state (post-compile) sweep,
and prints ONE JSON line:

    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ...}

``vs_baseline`` = baseline_seconds / measured_seconds (>1 beats target).

Env knobs for local debugging: BENCH_ROTATIONS, BENCH_GRID, BENCH_CHUNK,
BENCH_PROBE_ONLY=1 (skip the full run, report the probe extrapolation).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_SECONDS = 10.0


def main():
    n_rot = int(os.environ.get("BENCH_ROTATIONS", 13000))
    grid = int(os.environ.get("BENCH_GRID", 128))
    chunk = int(os.environ.get("BENCH_CHUNK", 8))
    probe_only = os.environ.get("BENCH_PROBE_ONLY", "0") == "1"

    from deeplocalproteindocking_tpu.config import DockConfig
    from deeplocalproteindocking_tpu.data import synthetic_complex
    from deeplocalproteindocking_tpu.pipeline import DockingPipeline
    from deeplocalproteindocking_tpu.structure.so3 import (
        super_fibonacci_rotations)
    from deeplocalproteindocking_tpu.sweep.docker import dock_sweep

    cfg = DockConfig(grid_size=grid, resolution=1.25,
                     rep_features=(32, 32, 16), rotation_chunk=chunk,
                     top_k=64)
    pipe = DockingPipeline(config=cfg)
    params = pipe.init_params(seed=0)

    cplx = synthetic_complex(seed=0, n_res_rec=60, n_res_lig=30)
    rec_vol = pipe.voxelize(cplx.receptor.centered())
    lig_vol = pipe.voxelize(cplx.ligand.centered())
    rep_rec, rep_lig, coupling = pipe.model.apply(
        {"params": params}, rec_vol, lig_vol)
    import numpy as _np
    _np.asarray(rep_rec[0, 0, 0]), _np.asarray(rep_lig[0, 0, 0])

    import numpy as np

    def run(rotations):
        res = dock_sweep(rep_rec, rep_lig, rotations, coupling,
                         top_k=cfg.top_k, chunk=chunk)
        # Synchronize by fetching outputs: on the tunneled axon platform
        # block_until_ready can return before execution completes, so a
        # device->host copy is the only reliable fence.
        np.asarray(res.scores)
        return res

    # Probe: compile + steady-state rate on a small rotation set.
    probe_n = min(max(4 * chunk, 64), n_rot)
    probe_rots = super_fibonacci_rotations(probe_n)
    run(probe_rots)                      # compile
    t0 = time.perf_counter()
    run(probe_rots)
    probe_t = time.perf_counter() - t0
    rate = probe_n / probe_t             # rotations / s
    projected = n_rot / rate

    detail = {"probe_rotations": probe_n, "probe_seconds": probe_t,
              "rotations_per_second": rate,
              "device": str(jax.devices()[0])}

    if probe_only or projected > 900.0:
        value = projected
        detail["projected"] = True
    else:
        full_rots = super_fibonacci_rotations(n_rot)
        run(full_rots)                   # compile for the full scan length
        t0 = time.perf_counter()
        run(full_rots)
        value = time.perf_counter() - t0
        detail["projected"] = False

    result = {
        "metric": f"full_sweep_{n_rot}rot_{grid}grid_wallclock",
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / value, 3),
    }
    print(json.dumps(result))
    print(json.dumps({"detail": detail}), file=sys.stderr)


if __name__ == "__main__":
    main()
