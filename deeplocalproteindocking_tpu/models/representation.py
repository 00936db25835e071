"""Learned 3-D CNN local representation network.

Capability parity with the reference's ``EQRepresentation``
[U: DeepLocalProteinDocking/Models/EQRepresentation.py — mount empty,
unverified]: a small stack of 3x3x3 3-D convolutions mapping the 11-type
density volume to a C_rep-channel learned representation.  Rotational
behavior comes from data augmentation, not architectural equivariance
(paper bioRxiv 738690) — so a plain conv stack is the faithful capability.

TPU-native notes: channels-last ``[L, L, L, C]`` layout puts channels on
the 128-wide lane dimension so XLA lowers the convs onto the MXU; a
``dtype`` knob runs the convs in bfloat16 for serving (params stay
float32, outputs are cast back).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def shape_channels(vol: jnp.ndarray, *, core_weight: float = 12.0,
                   threshold: float = 0.35, shell: int = 2):
    """Analytic (surface, core) channels from a density volume.

    ``vol [..., L, L, L, T] -> [..., L, L, L, 2]``: core = occupancy
    above threshold, surface = ``shell``-voxel dilation minus core —
    ZDOCK-style shape complementarity with the canonical coupling
    ``[[1, 0], [0, -core_weight]]`` (surface-surface attracts,
    core-core repels).  Used standalone (pipeline shape mode) and as
    the physical prior inside :class:`HybridRepresentation`.
    """
    occ = vol.sum(-1)
    core = (occ > threshold).astype(jnp.float32)
    w = 2 * shell + 1
    batch = core.ndim - 3
    # Cube dilation is separable: three 1-D max-pools cost O(3w) per
    # voxel instead of O(w^3) — this runs per rotation on the sweep hot
    # path (measured 0.29 -> ~0.1 ms/rotation at 40^3 x chunk 16).
    dil = core
    for ax in range(3):
        win = [1] * core.ndim
        win[batch + ax] = w
        dil = jax.lax.reduce_window(dil, -jnp.inf, jax.lax.max,
                                    tuple(win), (1,) * core.ndim,
                                    "SAME")
    surface = dil - core
    rep = jnp.stack([surface, core], axis=-1)
    coupling = jnp.array([[1.0, 0.0], [0.0, -core_weight]], jnp.float32)
    return rep, coupling


def conv1_lowered(x: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None) -> jnp.ndarray:
    """First-layer 3-D conv with the ``DLPD_CONV1``-selected lowering.

    Functional core shared by :class:`_LoweringConv` (the Flax module)
    and ``pipeline._folded_rep_fn`` (the rank-truncated fast path) so
    the knob is honored on BOTH production paths — round-5 review: the
    licensed rank-3 default built its own plain conv chain, making the
    knob silently inert exactly where the flagship runs.

    The sweep's per-rotation CNN cost is conv1-heavy: its input is the
    11-type density, and 11 channels sit badly on the 128-lane VREG
    layout (the round-4 profile put the CNN at ~0.106 ms/rot vs an MXU
    ideal of ~6 us).  Lowerings (selected at trace time, same restart
    semantics as ``DLPD_FUSED_TOPK``):

      xla      lax.conv_general_dilated as-is (default — candidates
               are only promoted after tools/exp_conv1.py measures a
               win on hardware)
      pad16    zero-pad C_in -> 16 on both input and kernel before the
               same conv (sublane-aligned loads; numerically identical
               — padded channels contribute exact zeros)
      patches  explicit im2col: conv_general_dilated_patches -> one
               [N*L^3, 27*C_in] x [27*C_in, C_out] GEMM

    ``x`` is ``[..., L, L, L, C_in]`` (extra leading dims folded like
    ``nn.Conv``); ``w`` is ``[kx, ky, kz, C_in, C_out]``; ``b`` is
    added in ``x``'s compute dtype when given.
    """
    import os
    cin = x.shape[-1]
    feats = w.shape[-1]
    kernel = w.shape[:3]
    lead = x.shape[:-4]
    x = x.reshape((-1,) + x.shape[-4:])
    impl = os.environ.get("DLPD_CONV1", "xla")
    if impl == "pad16":
        pad = (-cin) % 16
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        w = jnp.pad(w, [(0, 0)] * 3 + [(0, pad), (0, 0)])
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    elif impl == "patches":
        n, d, h, wd, _ = x.shape
        p = jax.lax.conv_general_dilated_patches(
            x, kernel, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        # patches feature order is (C_in, *kernel_spatial):
        # fold the kernel to match (parity-tested vs xla).
        wf = w.transpose(3, 0, 1, 2, 4).reshape(-1, feats)
        y = (p.reshape(-1, p.shape[-1]) @ wf).reshape(
            n, d, h, wd, feats)
    else:
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(lead + y.shape[1:])


class _LoweringConv(nn.Module):
    """First-layer 3-D conv wrapping :func:`conv1_lowered`.

    Param tree matches ``nn.Conv`` exactly ("kernel"/"bias", lecun
    normal / zeros) so existing checkpoints load unchanged.
    """
    features: int
    kernel: Tuple[int, int, int]
    dtype: jnp.dtype
    use_bias: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kernel + (cin, self.features))
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,)).astype(self.dtype)
             if self.use_bias else None)
        return conv1_lowered(x, w.astype(self.dtype), b)


class Representation(nn.Module):
    features: Tuple[int, ...] = (32, 32, 16)
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, vol: jnp.ndarray) -> jnp.ndarray:
        """``[..., L, L, L, C_in] -> [..., L, L, L, C_rep]``."""
        squeeze = vol.ndim == 4
        x = vol[None] if squeeze else vol
        x = x.astype(self.dtype)
        k = (self.kernel,) * 3
        for i, f in enumerate(self.features):
            if i == 0:
                x = _LoweringConv(features=f, kernel=k,
                                  dtype=self.dtype,
                                  use_bias=self.use_bias,
                                  name="conv0")(x)
            else:
                x = nn.Conv(f, k, padding="SAME", dtype=self.dtype,
                            use_bias=self.use_bias, name=f"conv{i}")(x)
            if i + 1 < len(self.features):
                x = nn.elu(x)
        x = x.astype(jnp.float32)
        return x[0] if squeeze else x


class HybridRepresentation(nn.Module):
    """Learned residual on an analytic shape prior.

    Output channels = ``[surface, core] ++ CNN(features)``.  With the
    matching block-diagonal coupling init (models/scoring.py), the
    UNTRAINED model scores exactly classic shape complementarity; the
    ranking loss then trains the CNN channels and the full coupling to
    correct it — so "learned beats shape" is the training objective's
    zero point, not a hope.  The shape branch uses non-differentiable
    threshold/dilation (gradients flow through the learned branch and
    the coupling only), mirroring how the reference's learned scoring
    competes against fixed physical terms [P: bioRxiv 738690].
    """
    features: Tuple[int, ...] = (32, 16)
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vol: jnp.ndarray) -> jnp.ndarray:
        # BIAS-FREE CNN: with biases, learned channels are nonzero over
        # the whole empty box (ELU(bias) background), so their
        # correlations carry a volume-overlap term that swamps ranking
        # on complexes of unseen size (measured: a biased hybrid
        # DEGRADED held-out global top-1 from 0.875 to 0.25).  Bias-
        # free convs keep learned features supported near atoms, like
        # the physical channels.
        learned = Representation(features=self.features,
                                 kernel=self.kernel, dtype=self.dtype,
                                 use_bias=False, name="cnn")(vol)
        prior, _ = shape_channels(vol)
        return jnp.concatenate([prior, learned], axis=-1)
