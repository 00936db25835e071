"""Print a checkpoint's channel-coupling singular-value spectrum.

Decides the ``DockConfig.coupling_rank`` knob: the docking score is
bilinear in the coupling, so a rank-r SVD truncation with tail energy
``sum_{i>r} s_i^2 / sum s_i^2`` below ~1% is a near-free ligand-side
channel reduction in the correlator (pipeline._spectral_parts).

Usage: python tools/coupling_spectrum.py CKPT_DIR
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "pretrained/synthetic-v5u/best"
    from deeplocalproteindocking_tpu.config import DockConfig
    from deeplocalproteindocking_tpu.train import Trainer
    cfg_path = os.path.join(ckpt, "config.json")
    if not os.path.exists(cfg_path):
        cfg_path = os.path.join(os.path.dirname(ckpt), "config.json")
    with open(cfg_path) as f:
        cfg = DockConfig.from_json(f.read())
    state = Trainer(cfg).restore(ckpt)
    A = np.asarray(state.params["coupling"], np.float64)
    s = np.linalg.svd(A, compute_uv=False)
    e = s ** 2
    cum = np.cumsum(e) / e.sum()
    print(f"coupling {A.shape}, singular values:")
    for i, (sv, c) in enumerate(zip(s, cum)):
        print(f"  r={i + 1:2d}  s={sv:9.4f}  cumulative energy {c:.5f}")
    for thr in (0.99, 0.999):
        r = int(np.searchsorted(cum, thr) + 1)
        print(f"rank covering {thr:.1%} energy: {r}")


if __name__ == "__main__":
    main()
