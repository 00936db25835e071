"""Scoring model: shared representation net + learned channel coupling.

Capability parity with the reference's ``EQScoringModel``
[U: DeepLocalProteinDocking/Models/EQScoringModel.py — mount empty,
unverified]: receptor and ligand share one representation network, and
the docking score of a pose (R, t) is a PIPER-style sum over channel
pairs of translational correlations between ``rep(rec)`` and
``rep(rotate(lig, R))``, with a learned coupling between channels.

The coupling is a full ``[C_rep, C_rep]`` matrix (the most general of
the schemes the reference lineage uses), initialized to the identity so
an untrained model scores pure multi-channel shape complementarity.
The actual sweep lives in ``sweep/docker.py`` as pure functions of
``(rep_rec, rep_lig, coupling)`` — the module only owns parameters.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from deeplocalproteindocking_tpu.models.representation import (
    HybridRepresentation, Representation, shape_channels,
)


def _identity_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.eye(shape[0], shape[1], dtype=dtype)


def _shape_block_init(key, shape, dtype=jnp.float32):
    """Block-diagonal init for the hybrid model: the 2x2 shape-
    complementarity coupling in the prior block, ZEROS elsewhere —
    so the untrained hybrid scores EXACTLY classic shape
    complementarity (the learned channels contribute nothing until
    the ranking loss moves the coupling off zero)."""
    del key
    m = jnp.zeros(shape, dtype=dtype)
    return m.at[:2, :2].set(shape_channels(jnp.zeros((4, 4, 4, 1)))[1])


class ScoringModel(nn.Module):
    features: Tuple[int, ...] = (32, 32, 16)
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    shape_prior: bool = False    # hybrid: analytic (surface, core)
                                 # channels ++ learned CNN channels

    def setup(self):
        if self.shape_prior:
            self.representation = HybridRepresentation(
                features=self.features, kernel=self.kernel,
                dtype=self.dtype)
            c = self.features[-1] + 2
            self.coupling = self.param("coupling", _shape_block_init,
                                       (c, c))
        else:
            self.representation = Representation(
                features=self.features, kernel=self.kernel,
                dtype=self.dtype)
            c = self.features[-1]
            self.coupling = self.param("coupling", _identity_init,
                                       (c, c))

    def __call__(self, rec_vol: jnp.ndarray, lig_vol: jnp.ndarray):
        """Returns (rep_rec, rep_lig, coupling) for the sweep/trainer."""
        rep_rec = self.representation(rec_vol)
        rep_lig = self.representation(lig_vol)
        return rep_rec, rep_lig, self.coupling

    def represent(self, vol: jnp.ndarray) -> jnp.ndarray:
        return self.representation(vol)
