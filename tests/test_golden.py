"""Golden parity snapshot (SURVEY.md §4): a fixed-seed small sweep whose
ranked pose list is committed; any change to splat / rotation /
correlation / top-K semantics trips this test.  Regenerate consciously
with: python tests/test_golden.py"""
import json
import os

import numpy as np
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_sweep.json")
GOLDEN_RESPLAT_PATH = os.path.join(os.path.dirname(__file__),
                                   "golden_sweep_resplat.json")


def _run_golden(mode="resample"):
    from deeplocalproteindocking_tpu.config import DockConfig
    from deeplocalproteindocking_tpu.data import synthetic_complex
    from deeplocalproteindocking_tpu.pipeline import DockingPipeline
    from deeplocalproteindocking_tpu.structure.so3 import (
        super_fibonacci_rotations)

    cfg = DockConfig(grid_size=32, resolution=1.5, num_rotations=12,
                     rotation_chunk=4, top_k=8, rep_features=(8,),
                     sweep_mode=mode)
    cplx = synthetic_complex(seed=42, n_res_rec=10, n_res_lig=5)
    pipe = DockingPipeline(config=cfg)          # shape mode
    rots = super_fibonacci_rotations(cfg.num_rotations)
    poses = pipe.dock_complex(cplx, rotations=rots, cluster=False)
    return {
        "scores": [round(float(s), 3) for s in poses.scores],
        "rot_idx": [int(r) for r in poses.rot_idx],
        "shifts": [[int(v) for v in s] for s in poses.shifts],
    }


class TestGolden:
    def _check(self, mode, path):
        got = _run_golden(mode)
        with open(path) as f:
            want = json.load(f)
        assert got["rot_idx"] == want["rot_idx"]
        assert got["shifts"] == want["shifts"]
        np.testing.assert_allclose(got["scores"], want["scores"],
                                   rtol=1e-3, atol=2e-3)

    def test_matches_snapshot_resample(self):
        self._check("resample", GOLDEN_PATH)

    def test_matches_snapshot_resplat(self):
        self._check("resplat", GOLDEN_RESPLAT_PATH)

    def test_double_run_deterministic(self):
        for mode in ("resample", "resplat"):
            assert _run_golden(mode) == _run_golden(mode)


if __name__ == "__main__":
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    with open(GOLDEN_PATH, "w") as f:
        json.dump(_run_golden("resample"), f, indent=1)
    with open(GOLDEN_RESPLAT_PATH, "w") as f:
        json.dump(_run_golden("resplat"), f, indent=1)
    print(f"wrote {GOLDEN_PATH} and {GOLDEN_RESPLAT_PATH}")
