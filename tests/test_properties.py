"""Property-based invariants (hypothesis) for the geometric core.

SURVEY.md §4 test strategy, round-5 depth pass: the example-based unit
tier pins known shapes; these properties pin the ALGEBRA on arbitrary
inputs — rotation-set validity at any count, transform group laws,
splat mass conservation and lattice equivariance, exact top-K equality
against lax.top_k under ties/infinities, and min-RMSD invariances.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.grids.voxelize import (
    separable_splat, splat)
from deeplocalproteindocking_tpu.structure.so3 import (
    geodesic_angle, local_rotations, super_fibonacci_rotations)
from deeplocalproteindocking_tpu.structure.transforms import (
    apply_pose, axis_angle_to_matrix, quat_to_matrix, random_rotations)
from deeplocalproteindocking_tpu.sweep.topk import exact_block_topk
from deeplocalproteindocking_tpu.utils.rmsd import kabsch_rmsd, rmsd

_SET = settings(max_examples=25, deadline=None)


# --------------------------------------------------------------- SO(3)
@_SET
@given(st.integers(min_value=1, max_value=400))
def test_super_fibonacci_valid_rotations(n):
    R = np.asarray(super_fibonacci_rotations(n))
    assert R.shape == (n, 3, 3)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


@_SET
@given(st.integers(min_value=0, max_value=10 ** 6),
       st.floats(min_value=5.0, max_value=90.0))
def test_local_cone_stays_in_cone(seed, deg):
    base = np.asarray(quat_to_matrix(jax.random.normal(
        jax.random.PRNGKey(seed), (4,))))
    rots = local_rotations(jnp.asarray(base), np.deg2rad(deg), 24,
                           key=jax.random.PRNGKey(seed))
    ang = np.asarray(geodesic_angle(rots, jnp.asarray(base)))
    assert ang.max() <= np.deg2rad(deg) + 1e-4


# --------------------------------------------------- transforms group
@_SET
@given(st.integers(min_value=0, max_value=10 ** 6))
def test_pose_compose_invert_roundtrip(seed):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (17, 3))
    R = random_rotations(k2, 1)[0]
    t = jax.random.normal(k3, (3,)) * 5.0
    y = apply_pose(x, R, t)
    back = (y - t) @ R            # R^-1 = R^T applied on the right
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=1e-4)


@_SET
@given(st.floats(min_value=-np.pi, max_value=np.pi),
       st.integers(min_value=0, max_value=10 ** 6))
def test_axis_angle_orthonormal(angle, seed):
    axis = jax.random.normal(jax.random.PRNGKey(seed), (3,))
    axis = axis / (jnp.linalg.norm(axis) + 1e-9)
    R = np.asarray(axis_angle_to_matrix(axis, jnp.asarray(angle)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


# ------------------------------------------------------------- splat
@_SET
@given(st.integers(min_value=0, max_value=10 ** 6),
       st.integers(min_value=1, max_value=12))
def test_splat_mass_conservation_and_match(seed, n_atoms):
    """Scatter oracle and matmul separable splat agree, and total mass
    is invariant to WHERE atoms sit (well inside the box)."""
    L, res = 16, 1.0
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(
        rng.uniform(-3.0, 3.0, size=(n_atoms, 3)).astype(np.float32))
    types = jnp.asarray(rng.integers(0, 11, n_atoms), jnp.int32)
    # window=12 so the scatter oracle's truncation tail vanishes (the
    # separable matmul splat is dense per axis) — same precedent as
    # tests/test_resplat.py.
    a = splat(coords, types, grid_size=L, resolution=res, num_types=11,
              window=12)
    b = separable_splat(coords, types,
                        jnp.ones(n_atoms, jnp.float32),
                        grid_size=L, resolution=res, num_types=11)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-5)
    mass = float(np.asarray(a).sum())
    shifted = splat(coords + 1.5, types, grid_size=L, resolution=res,
                    num_types=11, window=12)
    # rtol 1e-3: the Gaussian tail clipped at the box boundary after
    # the shift is sub-0.1% at these coordinates.
    np.testing.assert_allclose(float(np.asarray(shifted).sum()), mass,
                               rtol=1e-3)


@_SET
@given(st.integers(min_value=0, max_value=10 ** 6),
       st.integers(min_value=-2, max_value=2),
       st.integers(min_value=-2, max_value=2))
def test_splat_lattice_equivariance(seed, sx, sy):
    """Translating atoms by whole voxels rolls the volume."""
    L, res = 16, 1.25
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(
        rng.uniform(-3.0, 3.0, size=(6, 3)).astype(np.float32))
    types = jnp.asarray(rng.integers(0, 11, 6), jnp.int32)
    base = np.asarray(splat(coords, types, grid_size=L,
                            resolution=res, num_types=11))
    shift = jnp.asarray([sx * res, sy * res, 0.0], jnp.float32)
    moved = np.asarray(splat(coords + shift, types, grid_size=L,
                             resolution=res, num_types=11))
    rolled = np.roll(base, (sx, sy), axis=(0, 1))
    np.testing.assert_allclose(moved, rolled, rtol=2e-4, atol=1e-5)


# ------------------------------------------------------------- top-K
@_SET
@given(st.integers(min_value=0, max_value=10 ** 6),
       st.integers(min_value=1, max_value=8),
       st.sampled_from([64, 96, 128, 256]))
def test_exact_block_topk_equals_lax(seed, k, n):
    rng = np.random.default_rng(seed)
    # Heavy ties + -inf stripes: the regimes where approximate top-K
    # schemes lose elements.
    x = rng.choice([-np.inf, -1.0, 0.0, 0.5, 1.0, 1.0, 2.0],
                   size=(3, n)).astype(np.float32)
    vals, flat = exact_block_topk(jnp.asarray(x), k)
    want, _ = jax.lax.top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.sort(np.asarray(vals), axis=1),
                                  np.sort(np.asarray(want), axis=1))
    looked = np.take_along_axis(x, np.asarray(flat), axis=1)
    np.testing.assert_array_equal(np.sort(looked, axis=1),
                                  np.sort(np.asarray(want), axis=1))


# -------------------------------------------------------------- RMSD
@_SET
@given(st.integers(min_value=0, max_value=10 ** 6))
def test_kabsch_invariances(seed):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (23, 3)) * 3.0
    R = random_rotations(k2, 1)[0]
    t = jax.random.normal(k3, (3,)) * 7.0
    b = apply_pose(a, R, t)
    # Min-RMSD of a rigid transform of itself is ~0 (f32 eigensolve on
    # coordinates spread over ~10 A) and never exceeds the plain RMSD.
    assert float(kabsch_rmsd(a, b)) < 1e-2
    noisy = b + 0.1 * jax.random.normal(k3, b.shape)
    assert float(kabsch_rmsd(a, noisy)) <= float(rmsd(a, noisy)) + 1e-5
