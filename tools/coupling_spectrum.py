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
    U, s, Vt = np.linalg.svd(A)
    e = s ** 2
    cum = np.cumsum(e) / e.sum()
    # DEVIATION CAPTURE is the licensing criterion, not energy: the
    # hybrid's coupling is dominated by the +-core_weight shape block
    # (99.99% of energy), but what training LEARNED is the deviation
    # from that block — and a truncation can keep all the energy while
    # discarding most of the deviation.  Measured round 4 (v9p,
    # held-out 48): rank 2 kept 99.992% energy but only 29% of the
    # deviation and collapsed global top-1 0.333 -> 0.167 (below the
    # 0.271 shape baseline); rank 3 kept 96% of the deviation and was
    # hit-rate-identical to full rank AND to fp32.
    # Shared licensing implementation — the same computation gates
    # coupling_rank at dock time (pipeline._spectral_parts warns when
    # the configured rank fails the >=95% deviation criterion).
    from deeplocalproteindocking_tpu.pipeline import (
        coupling_deviation_capture, min_licensed_rank)
    sp = bool(getattr(cfg, "shape_prior", False))
    prior_name = "shape_block" if sp else "identity"
    _, dev = coupling_deviation_capture(A, 1, shape_prior=sp)
    print(f"coupling {A.shape}, ||A - {prior_name}|| = {dev:.4f}:")
    for r in range(1, len(s) + 1):
        kept, _ = coupling_deviation_capture(A, r, shape_prior=sp)
        lost = (1.0 - kept) * dev
        print(f"  r={r:2d}  s={s[r - 1]:9.4f}  energy {cum[r - 1]:.5f}"
              f"  trunc-err {lost:.4f}  deviation kept {kept:6.1%}")
    print(f"smallest rank keeping >=95% of the learned deviation: "
          f"{min_licensed_rank(A, shape_prior=sp)}")


if __name__ == "__main__":
    main()
