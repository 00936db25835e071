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
