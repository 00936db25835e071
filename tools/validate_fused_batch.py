"""TPU validation: the batched fused invz+topk path on real hardware.

Round 4: a vmapped ``pallas_call`` of ``invz_blockmax`` faulted the TPU
worker, so every batched consumer (pipeline.rescore's 16-head vmap,
parallel.batch_eval's complex groups, dock_ensemble) pinned
``fused_topk=False``.  Round 5 folds the mapped axis into the kernel's
own ``b`` grid axis via ``custom_vmap`` — interpret-mode parity is
covered by tests/test_pallas_invz_topk.py, but Mosaic compile
acceptance and worker stability can only be proven on a chip.

Drives three production surfaces at grid 64 with the fused path ON vs
OFF (separate subprocesses: DLPD_FUSED_TOPK is read at trace time) and
compares scores:

  1. ``dock_complex``          — single pair        (round-4 OK path)
  2. ``pipeline.rescore``      — per-head vmap      (round-4 fault)
  3. ``batch_eval.dock_batch`` — 3-complex group    (round-4 fault)

Prints ONE JSON line; exit 0 iff all surfaces agree.  On a non-TPU
backend the fused path never engages and the comparison passes
trivially ("backend" in the record says which case ran).

Usage: python tools/validate_fused_batch.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def worker(out_path: str) -> None:
    from deeplocalproteindocking_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from deeplocalproteindocking_tpu.config import DockConfig
    from deeplocalproteindocking_tpu.data import synthetic_complex
    from deeplocalproteindocking_tpu.data.benchmark import (
        structure_to_device)
    from deeplocalproteindocking_tpu.parallel.batch_eval import dock_batch
    from deeplocalproteindocking_tpu.pipeline import DockingPipeline
    from deeplocalproteindocking_tpu.sweep.resplat import auto_ligand_grid

    # Scratch seed band (150+) — never the held-out report band.
    cfg = DockConfig(grid_size=64, resolution=1.25, rep_features=(8,),
                     num_rotations=128, rotation_chunk=32, top_k=16,
                     nms_rmsd=5.0, fft_impl="dft_fused",
                     dft_dtype="float32")
    pipe = DockingPipeline(config=cfg)
    complexes = [synthetic_complex(seed=150 + i, backbone=True)
                 for i in range(3)]

    out = {"backend": jax.default_backend(),
           "fused_env": os.environ.get("DLPD_FUSED_TOPK", "")}

    # 1. single-pair dock (clustered poses feed surface 2).
    poses = pipe.dock_complex(complexes[0])
    out["dock_scores"] = np.asarray(poses.scores)
    out["dock_shifts"] = np.asarray(poses.shifts)

    # 2. heads-batched rescore (the vmapped entry that faulted).
    rs = pipe.rescore(complexes[0].receptor, complexes[0].ligand,
                      poses, top=4, nrot=16)
    out["rescore_scores"] = np.asarray(rs.scores)

    # 3. complex-group batched dock (mirrors evaluation.py's batched
    # runner plumbing at its defaults).
    max_atoms = max(max(len(c.receptor.typed()), len(c.ligand.typed()))
                    for c in complexes)
    max_atoms = max(64, ((max_atoms + 63) // 64) * 64)
    lig_grid = max(auto_ligand_grid(
        c.ligand.centered().typed().coords, cfg.resolution, cfg.sigma,
        pipe._receptive_field(), cfg.grid_size) for c in complexes)
    lig_grid = min(cfg.grid_size, ((lig_grid + 15) // 16) * 16)
    rec_dev = [structure_to_device(c.receptor.centered(), max_atoms)
               for c in complexes]
    _impl, H_batch, rep_fn = pipe._batched_receptor_engine(
        jnp.stack([d[0] for d in rec_dev]),
        jnp.stack([d[1] for d in rec_dev]),
        jnp.stack([d[2] for d in rec_dev]))
    lig_dev = [structure_to_device(c.ligand.centered(), max_atoms)
               for c in complexes]
    res = dock_batch(
        None, H_batch,
        jnp.stack([d[0] for d in lig_dev]),
        jnp.stack([d[1] for d in lig_dev]),
        jnp.stack([d[2] for d in lig_dev]),
        pipe.rotation_set(), rep_fn,
        grid_size=cfg.grid_size, lig_grid=lig_grid,
        resolution=cfg.resolution, sigma=cfg.sigma,
        num_types=cfg.num_atom_types, top_k=cfg.top_k,
        chunk=max(1, cfg.rotation_chunk // len(complexes)))
    out["batch_scores"] = np.asarray(res.scores)
    out["batch_shifts"] = np.asarray(res.shifts)

    np.savez(out_path, **out)


def main() -> int:
    outs = {}
    with tempfile.TemporaryDirectory() as td:
        for fused in ("0", "1"):
            path = os.path.join(td, f"fused{fused}.npz")
            env = dict(os.environ, DLPD_FUSED_TOPK=fused)
            # Hard timeout: the worker's first device op hangs forever
            # when the TPU relay half-answers (observed round 4/5 —
            # HTTP up, backend init wedged).  This tool runs unattended
            # at the head of the recovery queue; a hang here stalls
            # every queued measurement behind it, so a wedged worker
            # must become a parseable failure instead.
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--worker", path],
                    env=env, cwd=_ROOT,
                    timeout=float(os.environ.get("VFB_TIMEOUT", 900)))
            except subprocess.TimeoutExpired:
                print(json.dumps({
                    "fused_batch_ok": False,
                    "error": f"worker DLPD_FUSED_TOPK={fused} timed "
                             f"out (TPU backend wedged?)"}))
                return 1
            if r.returncode != 0:
                print(json.dumps({
                    "fused_batch_ok": False,
                    "error": f"worker DLPD_FUSED_TOPK={fused} exited "
                             f"{r.returncode} (TPU worker fault?)"}))
                return 1
            outs[fused] = dict(np.load(path, allow_pickle=False))

    a, b = outs["0"], outs["1"]
    diffs, ok = {}, True
    for key in ("dock_scores", "rescore_scores", "batch_scores"):
        if a[key].shape != b[key].shape:
            # Post-clustering pose lists are variable-length: a
            # near-tie flip from the fused kernel's accumulation
            # order can change which poses NMS suppresses.  A shape
            # mismatch is a real disagreement — report it as the
            # parseable failure the recovery queue parses, never a
            # ValueError traceback.
            print(json.dumps({
                "fused_batch_ok": False,
                "error": f"{key} shape mismatch: "
                         f"{list(a[key].shape)} vs "
                         f"{list(b[key].shape)}"}))
            return 1
        d = float(np.max(np.abs(a[key] - b[key])))
        scale = float(np.max(np.abs(a[key]))) or 1.0
        diffs[key] = d
        # Exact top-K on identical float32 math: both paths must agree
        # to accumulation-order noise only.  BOTH sides must be finite
        # and the tolerance test is written NaN-safe (`not (d <= tol)`)
        # — a NaN-producing fused kernel is precisely the failure this
        # tool exists to catch, and `NaN > tol` is False.
        if (not np.isfinite(a[key]).all()
                or not np.isfinite(b[key]).all()
                or not (d <= 1e-3 * scale)):
            ok = False
    same_shifts = bool(
        np.array_equal(a["dock_shifts"], b["dock_shifts"])
        and np.array_equal(a["batch_shifts"], b["batch_shifts"]))
    print(json.dumps({
        "fused_batch_ok": bool(ok and same_shifts),
        "backend": str(a["backend"]),
        "max_abs_diff": diffs,
        "shifts_equal": same_shifts}))
    return 0 if (ok and same_shifts) else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        sys.exit(main())
