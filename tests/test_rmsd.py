import numpy as np
import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.utils import (
    rmsd, kabsch_rmsd, kabsch_rotation,
    ligand_rmsd, interface_rmsd, fnat, capri_class,
)
from deeplocalproteindocking_tpu.structure.transforms import (
    random_rotations, apply_pose,
)
from deeplocalproteindocking_tpu.sweep.cluster import (
    pose_pairwise_rmsd, nms_cluster,
)


def _coords(n=30, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32) * 5)


class TestRMSD:
    def test_identical_is_zero(self):
        x = _coords()
        assert float(rmsd(x, x)) == 0.0
        assert float(kabsch_rmsd(x, x)) < 1e-3

    def test_kabsch_invariant_to_rigid_motion(self):
        x = _coords()
        R = random_rotations(jax.random.key(0), 1)[0]
        y = apply_pose(x, R, jnp.array([3.0, -2.0, 7.0]))
        assert float(kabsch_rmsd(x, y)) < 1e-2
        assert float(rmsd(x, y)) > 1.0  # plain rmsd is not invariant

    def test_kabsch_less_equal_plain(self):
        a, b = _coords(seed=1), _coords(seed=2)
        assert float(kabsch_rmsd(a, b)) <= float(rmsd(a, b)) + 1e-5

    def test_kabsch_rotation_recovers(self):
        x = _coords()
        R = random_rotations(jax.random.key(1), 1)[0]
        y = x @ R.T
        R_hat = kabsch_rotation(x, y)
        np.testing.assert_allclose(np.asarray(R_hat), np.asarray(R),
                                   atol=1e-3)

    def test_masked(self):
        x = _coords()
        y = x.at[-1].set(1000.0)  # corrupt one atom, mask it out
        mask = jnp.ones(len(x)).at[-1].set(0.0)
        assert float(rmsd(x, y, mask)) < 1e-5
        assert float(kabsch_rmsd(x, y, mask)) < 5e-3

    def test_matches_numpy_kabsch_oracle(self):
        a, b = np.asarray(_coords(seed=3)), np.asarray(_coords(seed=4))
        ac, bc = a - a.mean(0), b - b.mean(0)
        # SVD-based Kabsch oracle
        U, S, Vt = np.linalg.svd(ac.T @ bc)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        rot = Vt.T @ np.diag([1, 1, d]) @ U.T
        aligned = ac @ rot.T
        want = np.sqrt(((aligned - bc) ** 2).sum(-1).mean())
        got = float(kabsch_rmsd(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestQuality:
    def test_ligand_rmsd_zero_at_native(self):
        lig = _coords()
        assert float(ligand_rmsd(lig, lig)) == 0.0

    def test_interface_rmsd_zero_at_native(self):
        rec, lig = _coords(seed=5), _coords(seed=6) + 8.0
        assert float(interface_rmsd(rec, lig, lig)) < 1e-3

    def test_fnat_native_is_one(self):
        rec, lig = _coords(seed=7), _coords(seed=8) + 6.0
        rr = jnp.arange(len(rec)) // 3
        lr = jnp.arange(len(lig)) // 3
        assert float(fnat(rec, lig, lig, rr, lr)) == 1.0
        far = lig + 100.0
        assert float(fnat(rec, lig, far, rr, lr)) == 0.0

    def test_capri_classes(self):
        assert capri_class(0.8, 0.5, 0.5) == 3   # high
        assert capri_class(0.4, 3.0, 1.5) == 2   # medium
        assert capri_class(0.2, 8.0, 3.0) == 1   # acceptable
        assert capri_class(0.0, 50.0, 20.0) == 0


class TestPoseCluster:
    def test_pairwise_matches_direct(self):
        lig = _coords()
        Rs = random_rotations(jax.random.key(2), 4)
        ts = jnp.asarray(
            np.random.default_rng(9).normal(size=(4, 3)).astype(np.float32))
        D = np.asarray(pose_pairwise_rmsd(lig, Rs, ts))
        mu = lig.mean(0)
        centered = lig - mu
        for i in range(4):
            for j in range(4):
                a = apply_pose(centered, Rs[i], ts[i])
                b = apply_pose(centered, Rs[j], ts[j])
                want = float(rmsd(a, b))
                np.testing.assert_allclose(D[i, j], want, rtol=1e-3,
                                           atol=1e-3)

    def test_nms(self):
        scores = np.array([5.0, 4.0, 3.0, 2.0])
        D = np.array([[0.0, 1.0, 9.0, 9.0],
                      [1.0, 0.0, 9.0, 9.0],
                      [9.0, 9.0, 0.0, 0.5],
                      [9.0, 9.0, 0.5, 0.0]])
        keep = nms_cluster(scores, D, radius=2.0)
        assert list(keep) == [0, 2]

    def test_nms_max_out(self):
        scores = np.array([5.0, 4.0, 3.0, 2.0])
        D = np.full((4, 4), 9.0)
        np.fill_diagonal(D, 0.0)
        keep = nms_cluster(scores, D, radius=1.0, max_out=2)
        assert list(keep) == [0, 1]

    def test_nms_skips_nonfinite(self):
        scores = np.array([np.inf, 5.0, -np.inf])
        D = np.full((3, 3), 9.0)
        np.fill_diagonal(D, 0.0)
        keep = nms_cluster(scores, D, radius=1.0)
        assert 1 in keep and 2 not in keep and 0 not in keep
