"""Headline benchmark: per-complex full SO(3) x T docking sweep.

Target (BASELINE.md, driver-written north star): a full ~13k-rotation x
128^3-translation sweep per complex in < 10 s on TPU (the north-star
phrasing targets a v5e-8; this script runs on however many chips are
visible — one under the driver — and rotation-shards across them when
more than one is available).

The measured path is the flagship TPU-native sweep: 11-type splat ->
3D-CNN receptor representation -> cached coupled receptor spectrum ->
per-rotation [exact coordinate rotation -> matmul separable splat on
the ligand box -> CNN -> matmul-DFT correlation -> streaming top-K].

Prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ...}
``vs_baseline`` = baseline_seconds / measured_seconds (>1 beats target).

Env knobs: BENCH_ROTATIONS, BENCH_GRID, BENCH_CHUNK, BENCH_FFT
("dft"|"xla"), BENCH_DTYPE ("float32"|"bfloat16"), BENCH_RANK
(coupling_rank SVD truncation; default 3 — licensed round 4 by the
held-out 48-complex columns: rank-3 == full-rank == fp32 on every hit
decision, while rank-2 keeps the energy but drops 71% of the learned
coupling deviation and collapses top-1 below the shape baseline; 0
runs full-rank), BENCH_PROBE_ONLY=1.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SECONDS = 10.0


def _metric_name() -> str:
    """The workload's metric key, derived from env exactly like the
    success record — error records must land in the SAME series they
    stand in for (a -1.0 row tagged with the full-rank name would
    contaminate the historical full-rank series when BENCH_RANK=3)."""
    n_rot = int(os.environ.get("BENCH_ROTATIONS", 13000))
    grid = int(os.environ.get("BENCH_GRID", 128))
    rank = int(os.environ.get("BENCH_RANK", 3)) or None
    rank_tag = "" if rank is None else f"_rank{rank}"
    return f"full_sweep_{n_rot}rot_{grid}grid{rank_tag}_wallclock"


def _watchdog(seconds: float):
    """Hard-exit with an explicit JSON error if the run wedges.

    The axon TPU tunnel can hang indefinitely at backend init when the
    remote terminal is down (observed round 4: a 4+ hour outage where
    the first device op never returned) — without this, the driver's
    bench invocation inherits the hang.  A daemon timer prints one
    parseable line and exits hard; main() cancels it on success.
    """
    import threading

    def fire():
        print(json.dumps({
            "metric": _metric_name(),
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
            "error": f"bench timed out after {seconds:.0f}s "
                     f"(TPU backend unreachable?)"}), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _relay_refused() -> bool:
    """True only when the axon TPU relay actively refuses TCP connects.

    The driver's bench invocation runs in a zero-egress container whose
    only TPU path is the loopback relay (sitecustomize.py: the claim leg
    dials ``127.0.0.1:<port>``).  When the relay process is down the
    port refuses outright and JAX backend init hangs forever (round-4
    outage: first device op never returned in 4+ h).  A refused connect
    is unambiguous — nothing is listening — so bench can emit its
    parseable error record in seconds instead of burning the 1200 s
    watchdog.  Anything ambiguous (connect OK, timeout, non-axon
    platform, override set) returns False and the normal watchdog-
    guarded path runs.
    """
    if os.environ.get("BENCH_PRECHECK", "1") != "1":
        return False
    if os.environ.get("DLPD_PLATFORM") or \
            os.environ.get("JAX_PLATFORMS", "") != "axon":
        return False
    import socket
    port = int(os.environ.get("BENCH_RELAY_PORT", 8082))
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=5):
            return False
    except ConnectionRefusedError:
        return True
    except OSError:
        return False  # timeout/unreachable: ambiguous, let watchdog rule


def main():
    if _relay_refused():
        print(json.dumps({
            "metric": _metric_name(),
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
            "error": "TPU relay port refused connection "
                     "(axon relay down); bench not attempted"}),
            flush=True)
        sys.exit(2)
    wd = _watchdog(float(os.environ.get("BENCH_TIMEOUT", 1200)))
    n_rot = int(os.environ.get("BENCH_ROTATIONS", 13000))
    grid = int(os.environ.get("BENCH_GRID", 128))
    chunk = int(os.environ.get("BENCH_CHUNK", 128))
    fft_impl = os.environ.get("BENCH_FFT", "dft_fused")
    dft_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    rank = int(os.environ.get("BENCH_RANK", 3)) or None
    probe_only = os.environ.get("BENCH_PROBE_ONLY", "0") == "1"

    import jax
    from deeplocalproteindocking_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    from deeplocalproteindocking_tpu.config import DockConfig
    from deeplocalproteindocking_tpu.correlate.fft import (
        receptor_transform)
    from deeplocalproteindocking_tpu.data import synthetic_complex
    from deeplocalproteindocking_tpu.data.benchmark import (
        structure_to_device)
    from deeplocalproteindocking_tpu.pipeline import DockingPipeline
    from deeplocalproteindocking_tpu.structure.so3 import (
        super_fibonacci_rotations)
    from deeplocalproteindocking_tpu.sweep.resplat import (
        auto_ligand_grid, dock_sweep_resplat)

    # Flagship model family (pretrained/synthetic-v4): hybrid shape
    # prior (2 analytic channels) ++ two bias-free 3^3 convs (32, 14)
    # in bf16 = 16 correlation channels total — measured the best
    # quality/speed point on v5e (tools/exp_cnn.py; 3-layer stacks are
    # conv-layer-overhead-bound; 16 channels keep the fused kernel's
    # bf16 tiling exact).
    cfg = DockConfig(grid_size=grid, resolution=1.25,
                     rep_features=(32, 14), shape_prior=True,
                     compute_dtype="bfloat16",
                     rotation_chunk=chunk, coupling_rank=rank,
                     top_k=64, fft_impl=fft_impl, dft_dtype=dft_dtype)
    pipe = DockingPipeline(config=cfg)
    params = pipe.init_params(seed=0)

    cplx = synthetic_complex(seed=0, n_res_rec=60, n_res_lig=30)
    rec_vol = pipe.voxelize(cplx.receptor.centered())
    rep_rec = pipe.model.apply({"params": params}, rec_vol,
                               method=pipe.model.represent)
    cpl_eff, _rank_rep_fn = pipe._spectral_parts(params["coupling"])
    H = receptor_transform(rep_rec, cpl_eff)
    lig_c = cplx.ligand.centered()
    lc, lt, lm = structure_to_device(lig_c)
    lig_grid = cfg.lig_grid_size or auto_ligand_grid(
        lig_c.typed().coords, cfg.resolution, cfg.sigma,
        pipe._receptive_field(), cfg.grid_size)
    rep_fn = _rank_rep_fn   # == _ligand_rep_fn when BENCH_RANK unset

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from deeplocalproteindocking_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(rot=n_dev)

    kw = dict(grid_size=grid, lig_grid=lig_grid,
              resolution=cfg.resolution, sigma=cfg.sigma, num_types=11,
              top_k=cfg.top_k, chunk=chunk, fft_impl=fft_impl,
              dft_dtype=dft_dtype)

    def run(rotations):
        if mesh is not None:
            from deeplocalproteindocking_tpu.parallel.sharded_sweep \
                import sharded_dock_sweep_resplat
            res = sharded_dock_sweep_resplat(mesh, H, lc, lt, lm,
                                             rotations, rep_fn, **kw)
        else:
            res = dock_sweep_resplat(H, lc, lt, lm, rotations, rep_fn,
                                     **kw)
        # Fetch output to synchronize: block_until_ready can return
        # before execution completes on the tunneled axon platform.
        np.asarray(res.scores)
        return res

    probe_n = min(max(8 * chunk, 128), n_rot)
    probe_rots = super_fibonacci_rotations(probe_n)
    run(probe_rots)                      # compile
    t0 = time.perf_counter()
    run(probe_rots)
    probe_t = time.perf_counter() - t0
    rate = probe_n / probe_t
    projected = n_rot / rate

    detail = {"probe_rotations": probe_n, "probe_seconds": probe_t,
              "rotations_per_second": rate, "lig_grid": lig_grid,
              "devices": n_dev, "fft_impl": fft_impl,
              "dft_dtype": dft_dtype, "chunk": chunk,
              "coupling_rank": rank,
              "device": str(jax.devices()[0])}

    if probe_only or projected > 900.0:
        value = projected
        detail["projected"] = True
    else:
        full_rots = super_fibonacci_rotations(n_rot)
        run(full_rots)                   # compile for the full scan
        t0 = time.perf_counter()
        run(full_rots)
        value = time.perf_counter() - t0
        detail["projected"] = False

    # The north-star target is "< 10 s on a v5e-8" (BASELINE.md).
    # vs_baseline is plain wall-clock: 10 s / measured seconds on the
    # chips actually visible (one under the driver).  Both wall-clock
    # and chip-seconds are reported explicitly in the detail record;
    # no silent normalization (round-1 VERDICT "what's weak" #2).
    chip_seconds = value * n_dev
    detail["wallclock_seconds"] = round(value, 3)
    detail["chip_seconds"] = round(chip_seconds, 3)
    detail["target"] = f"<{BASELINE_SECONDS}s on v5e-8 (8 chips)"
    # The workload is named by its rank so cross-commit numbers never
    # conflate kernel speedups with a cheaper truncated-rank sweep
    # (round-4 ADVICE): full rank keeps the historical metric name;
    # the licensed default (rank 3) is explicit in both the name and
    # the top-level record.
    result = {
        "metric": _metric_name(),
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / value, 3),
        "coupling_rank": 0 if rank is None else rank,
    }
    wd.cancel()
    print(json.dumps(result))
    print(json.dumps({"detail": detail}), file=sys.stderr)


if __name__ == "__main__":
    main()
