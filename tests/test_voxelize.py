import numpy as np
import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.grids import splat, default_origin


def oracle_splat(coords, types, L, res, sigma, num_types):
    """Direct dense Gaussian summation over every voxel (NumPy oracle)."""
    origin = -0.5 * L * res
    grid = np.zeros((L, L, L, num_types), dtype=np.float64)
    centers = origin + (np.arange(L) + 0.5) * res
    gx, gy, gz = np.meshgrid(centers, centers, centers, indexing="ij")
    for (x, y, z), t in zip(np.asarray(coords), np.asarray(types)):
        if t < 0:
            continue
        r2 = (gx - x) ** 2 + (gy - y) ** 2 + (gz - z) ** 2
        grid[..., t] += np.exp(-r2 / (2 * sigma ** 2))
    return grid


class TestSplat:
    L, RES, SIGMA = 16, 1.0, 1.0

    def _random_atoms(self, n=20, seed=0):
        rng = np.random.default_rng(seed)
        coords = jnp.asarray(
            rng.uniform(-5, 5, size=(n, 3)).astype(np.float32))
        types = jnp.asarray(rng.integers(0, 11, size=n).astype(np.int32))
        return coords, types

    def test_matches_dense_oracle(self):
        coords, types = self._random_atoms()
        got = splat(coords, types, grid_size=self.L, resolution=self.RES,
                    sigma=self.SIGMA, window=8)
        want = oracle_splat(coords, types, self.L, self.RES, self.SIGMA, 11)
        # window=8 truncates at 4 voxels = 4 sigma: tail < 3e-4.
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)

    def test_mass_conservation_under_shift(self):
        # Total splatted mass is invariant to sub-voxel atom shifts
        # (up to window truncation).
        coords, types = self._random_atoms(n=5, seed=1)
        m0 = float(splat(coords, types, grid_size=self.L,
                         resolution=self.RES, window=8).sum())
        m1 = float(splat(coords + 0.37, types, grid_size=self.L,
                         resolution=self.RES, window=8).sum())
        assert abs(m0 - m1) / m0 < 1e-3

    def test_mask_and_negative_types(self):
        coords, types = self._random_atoms(n=4)
        mask = jnp.array([1.0, 0.0, 1.0, 1.0])
        types = types.at[3].set(-1)
        v = splat(coords, types, mask, grid_size=self.L,
                  resolution=self.RES)
        v_expected = splat(coords[jnp.array([0, 2])],
                           types[jnp.array([0, 2])],
                           grid_size=self.L, resolution=self.RES)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_expected),
                                   atol=1e-6)

    def test_deterministic_bitwise(self):
        # SURVEY.md §5.2: determinism is a test assertion (the CUDA
        # reference used atomicAdd and was NOT deterministic).
        coords, types = self._random_atoms(n=200, seed=2)
        a = np.asarray(splat(coords, types, grid_size=self.L,
                             resolution=self.RES))
        b = np.asarray(splat(coords, types, grid_size=self.L,
                             resolution=self.RES))
        np.testing.assert_array_equal(a, b)

    def test_gradient_matches_finite_differences(self):
        # The "grads through voxelizer" requirement.
        coords, types = self._random_atoms(n=3, seed=3)
        probe = jax.random.normal(jax.random.key(0), (self.L,) * 3 + (11,))

        def loss(c):
            v = splat(c, types, grid_size=self.L, resolution=self.RES,
                      window=8)
            return jnp.vdot(probe, v)

        g = jax.grad(loss)(coords)
        eps = 1e-3
        for (i, j) in [(0, 0), (1, 2), (2, 1)]:
            e = jnp.zeros_like(coords).at[i, j].set(eps)
            fd = (loss(coords + e) - loss(coords - e)) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=1e-4)

    def test_channels_last_layout(self):
        coords, types = self._random_atoms()
        v = splat(coords, types, grid_size=self.L, resolution=self.RES)
        assert v.shape == (self.L, self.L, self.L, 11)

    def test_custom_origin(self):
        coords = jnp.array([[2.0, 2.0, 2.0]])
        types = jnp.array([0], dtype=jnp.int32)
        origin = jnp.zeros(3)
        v = splat(coords, types, grid_size=8, resolution=1.0,
                  origin=origin, window=4)
        # Atom at (2,2,2) with origin 0 -> voxel centers at i+0.5; the
        # peak should be shared among voxels 1 and 2 (center 1.5/2.5).
        flat = int(jnp.argmax(v.sum(-1)))
        ix, iy, iz = flat // 64, (flat // 8) % 8, flat % 8
        assert all(i in (1, 2) for i in (ix, iy, iz))
