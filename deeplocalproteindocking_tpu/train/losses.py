"""Ranking loss over near-native vs decoy poses.

Capability parity with the reference's trainer loss
[U: DeepLocalProteinDocking/Training — mount empty, unverified;
BASELINE.json: north_star "ranking loss over near-native vs decoy
poses"]: a pairwise hinge so every near-native pose (LRMSD below a
threshold) outscores every decoy by at least ``margin``.

Convention: HIGHER score = better pose (correlation scores).  The loss
is the mean over all (near-native, decoy) pairs of
``max(0, margin - (S_pos - S_neg))``; complexes whose decoy set lacks a
positive or a negative contribute zero (masked mean, static shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ranking_hinge_loss(scores: jax.Array,
                       lrmsd: jax.Array,
                       *,
                       near_native_rmsd: float = 5.0,
                       margin: float = 1.0) -> jax.Array:
    """Pairwise hinge over one complex's decoy set.

    ``scores [D]``, ``lrmsd [D]`` -> scalar loss.
    """
    pos = (lrmsd <= near_native_rmsd).astype(scores.dtype)
    neg = 1.0 - pos
    diff = scores[:, None] - scores[None, :]             # S_i - S_j
    hinge = jnp.maximum(0.0, margin - diff)
    w = pos[:, None] * neg[None, :]                      # i near-native, j decoy
    return jnp.sum(hinge * w) / jnp.maximum(jnp.sum(w), 1.0)


def pairwise_ranking_accuracy(scores: jax.Array, lrmsd: jax.Array,
                              near_native_rmsd: float = 5.0) -> jax.Array:
    """Fraction of (near-native, decoy) pairs ranked correctly."""
    pos = (lrmsd <= near_native_rmsd).astype(scores.dtype)
    neg = 1.0 - pos
    correct = (scores[:, None] > scores[None, :]).astype(scores.dtype)
    w = pos[:, None] * neg[None, :]
    return jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1.0)
