import numpy as np
import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.grids import splat, rotate_volume, rotate_volumes
from deeplocalproteindocking_tpu.structure.transforms import (
    axis_angle_to_matrix, rotate,
)


def _atoms(n=12, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.uniform(-spread, spread, (n, 3)).astype(np.float32))
    types = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    return coords, types


class TestRotateVolume:
    L = 24

    def test_identity(self):
        coords, types = _atoms()
        v = splat(coords, types, grid_size=self.L, resolution=1.0,
                  num_types=3)
        v2 = rotate_volume(v, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)

    def test_90deg_exact(self):
        # 90-degree rotations map the lattice onto itself: resampling
        # must be exact (up to float), matching np.rot90 semantics.
        coords, types = _atoms()
        v = splat(coords, types, grid_size=self.L, resolution=1.0,
                  num_types=3)
        R = axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]),
                                 jnp.array(np.pi / 2))
        got = rotate_volume(v, R)
        # Volume voxel (i,j,k) holds density at x=i. R about z maps
        # (x,y,z)->(-y,x,z).
        want = splat(rotate(coords, R), types, grid_size=self.L,
                     resolution=1.0, num_types=3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_splat_rotate_commutes(self):
        # SE(3) property test (SURVEY.md §4): rotating coords then
        # splatting ~= splatting then rotating the volume (trilinear
        # interpolation smear bounded in L2).
        coords, types = _atoms(seed=1)
        R = axis_angle_to_matrix(jnp.array([1.0, 0.5, -0.3]),
                                 jnp.array(0.7))
        v_rot_coords = splat(rotate(coords, R), types, grid_size=self.L,
                             resolution=1.0, num_types=3)
        v_rot_vol = rotate_volume(
            splat(coords, types, grid_size=self.L, resolution=1.0,
                  num_types=3), R)
        a, b = np.asarray(v_rot_coords), np.asarray(v_rot_vol)
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 0.2, rel

    def test_mass_approx_conserved(self):
        coords, types = _atoms(seed=2)
        v = splat(coords, types, grid_size=self.L, resolution=1.0,
                  num_types=3)
        R = axis_angle_to_matrix(jnp.array([1.0, 1.0, 0.0]),
                                 jnp.array(1.1))
        v2 = rotate_volume(v, R)
        assert abs(float(v2.sum()) / float(v.sum()) - 1.0) < 0.02

    def test_batch_matches_single(self):
        coords, types = _atoms(seed=3)
        v = splat(coords, types, grid_size=self.L, resolution=1.0,
                  num_types=3)
        Rs = jnp.stack([
            jnp.eye(3),
            axis_angle_to_matrix(jnp.array([0.0, 1.0, 0.0]),
                                 jnp.array(0.5))])
        batch = rotate_volumes(v, Rs)
        np.testing.assert_allclose(np.asarray(batch[1]),
                                   np.asarray(rotate_volume(v, Rs[1])),
                                   atol=1e-6)

    def test_composition(self):
        # rotate(rotate(v, A), B) ~= rotate(v, B@A)
        coords, types = _atoms(seed=4, spread=3.0)
        v = splat(coords, types, grid_size=self.L, resolution=1.0,
                  num_types=3)
        A = axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]),
                                 jnp.array(0.4))
        B = axis_angle_to_matrix(jnp.array([0.0, 1.0, 0.0]),
                                 jnp.array(0.6))
        two = rotate_volume(rotate_volume(v, A), B)
        one = rotate_volume(v, B @ A)
        rel = (np.linalg.norm(np.asarray(two) - np.asarray(one))
               / np.linalg.norm(np.asarray(one)))
        assert rel < 0.2, rel
