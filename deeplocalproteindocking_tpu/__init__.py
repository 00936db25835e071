"""deeplocalproteindocking_tpu — TPU-native protein-protein docking framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
lupoglaz/DeepLocalProteinDocking (+ its native dependency
lupoglaz/TorchProteinLibrary): atom-to-grid density splatting, a learned
3D-CNN local representation network, rotated-ligand grid resampling,
exhaustive per-rotation 3D-FFT translational correlation, and ranked
rigid-body pose extraction — trained end-to-end with a ranking loss whose
gradients flow through the voxelizer and the FFT correlator.

The reference is a single-GPU PyTorch research code built on custom
CUDA/C++ extensions; this framework is TPU-first instead:

* volumes are channels-last ``[L, L, L, C]`` so 3-D convs land on the MXU,
* the SO(3) rotation sweep is one compiled ``lax.scan`` with a streaming
  top-K (no materialized rotation x translation score tensor),
* multi-chip scaling is a ``jax.sharding.Mesh`` with ``shard_map`` over a
  ``(rot, batch)`` mesh — top-K merge is the only cross-chip collective,
* the voxelizer is a deterministic scatter-add (no CUDA atomics), exactly
  differentiable w.r.t. atom coordinates.

Layer map (mirrors SURVEY.md §1/§2 inventory):

* ``structure/``  — PDB parsing, 11-type atom typing, rigid transforms,
  SO(3) rotation sets                   (reference N1-N3, P4)
* ``grids/``      — differentiable voxelizer, volume rotation, XPLOR
  export                               (reference N4, N6, N8)
* ``correlate/``  — FFT translational correlation engine with cached
  receptor spectrum + channel coupling (reference N5, core of P2)
* ``models/``     — 3D-CNN representation + scoring nets (reference P1/P2)
* ``sweep/``      — rotation-scan docker, streaming top-K, pose
  clustering/NMS                       (reference P3, P5)
* ``parallel/``   — mesh + shard_map sweep (NEW: reference is single-GPU)
* ``train/``      — decoy generation, ranking loss, trainer (P7, P8)
* ``data/``       — benchmark dataset handling + synthetic fixtures (P6)
* ``utils/``      — RMSD/quality metrics, metrics logging, profiling (N7, P9 support)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DLPD_PLATFORM"):
    # Escape hatch: some TPU PJRT plugins (axon) register themselves
    # from sitecustomize, preset JAX_PLATFORMS process-wide, and ignore
    # a user's JAX_PLATFORMS override — and when the TPU tunnel is
    # unreachable, backend init HANGS rather than fails.  The config
    # API is authoritative over both, so `DLPD_PLATFORM=cpu <tool>`
    # forces the platform before any backend initializes.  (A package-
    # owned variable, not JAX_PLATFORMS, because the plugin's own
    # preset value must not be re-asserted over test harnesses that
    # force CPU via the config API.)
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DLPD_PLATFORM"])

from deeplocalproteindocking_tpu.config import DockConfig, PRESETS  # noqa: F401
