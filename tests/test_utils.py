"""Config, logging and profiling utilities."""
import json
import time

import numpy as np

from deeplocalproteindocking_tpu.config import DockConfig, PRESETS
from deeplocalproteindocking_tpu.utils.logging import MetricsLogger
from deeplocalproteindocking_tpu.utils.profiling import StageTimer


class TestConfig:
    def test_json_roundtrip(self):
        cfg = DockConfig(grid_size=96, rep_features=(8, 4),
                         sweep_mode="resample", local_cone_deg=15.0)
        cfg2 = DockConfig.from_json(cfg.to_json())
        assert cfg2 == cfg
        assert cfg2.rep_features == (8, 4)

    def test_presets_cover_baseline_configs(self):
        # The five BASELINE.json configs map to five named presets.
        assert set(PRESETS) == {"tiny-shape", "rep-score", "full-sweep",
                                "train", "benchmark-v5e8"}
        assert PRESETS["full-sweep"].num_rotations == 13000
        assert PRESETS["benchmark-v5e8"].mesh_rot == 8

    def test_replace(self):
        cfg = DockConfig()
        assert cfg.replace(grid_size=32).grid_size == 32
        assert cfg.grid_size == 128  # frozen original

    def test_properties(self):
        cfg = DockConfig(grid_size=64, resolution=1.5,
                         rep_features=(8, 4))
        assert cfg.c_rep == 4
        assert cfg.box_extent == 96.0


class TestLogging:
    def test_jsonl_written(self, tmp_path):
        path = tmp_path / "m.jsonl"
        with MetricsLogger(str(path), echo=False) as log:
            log.log("train_step", step=1, loss=np.float32(0.5))
            log.log("eval", hit=True)
        lines = [json.loads(l) for l in path.read_text().splitlines()]
        assert len(lines) == 2
        assert lines[0]["event"] == "train_step"
        assert abs(lines[0]["loss"] - 0.5) < 1e-6   # np scalar unboxed
        assert lines[1]["hit"] is True
        assert "time" in lines[0]

    def test_no_path_echo_only(self, capsys):
        log = MetricsLogger(None, echo=True)
        log.log("x", v=1)
        assert '"v": 1' in capsys.readouterr().out


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            time.sleep(0.01)
        assert t.times["a"] >= 0.02
