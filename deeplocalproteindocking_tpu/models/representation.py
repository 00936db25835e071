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
import jax.numpy as jnp


class Representation(nn.Module):
    features: Tuple[int, ...] = (32, 32, 16)
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vol: jnp.ndarray) -> jnp.ndarray:
        """``[..., L, L, L, C_in] -> [..., L, L, L, C_rep]``."""
        squeeze = vol.ndim == 4
        x = vol[None] if squeeze else vol
        x = x.astype(self.dtype)
        k = (self.kernel,) * 3
        for i, f in enumerate(self.features):
            x = nn.Conv(f, k, padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            if i + 1 < len(self.features):
                x = nn.elu(x)
        x = x.astype(jnp.float32)
        return x[0] if squeeze else x
