import numpy as np
import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.correlate import (
    receptor_transform, correlate_scores,
)
from deeplocalproteindocking_tpu.grids import splat, rotate_volumes
from deeplocalproteindocking_tpu.structure.transforms import (
    axis_angle_to_matrix, rotate,
)
from deeplocalproteindocking_tpu.sweep import dock_sweep


def _volume(coords, L=16, C=2, types=None):
    if types is None:
        types = jnp.zeros(len(coords), dtype=jnp.int32)
    return splat(jnp.asarray(coords), types, grid_size=L, resolution=1.0,
                 num_types=C)


class TestDockSweep:
    def test_planted_translation(self):
        # Receptor = ligand shifted by an integer offset: the sweep with
        # only the identity rotation must find exactly that offset.
        L = 16
        rng = np.random.default_rng(0)
        lig_coords = rng.uniform(-4, 4, (10, 3)).astype(np.float32)
        shift = np.array([2.0, -3.0, 1.0], dtype=np.float32)
        rec = _volume(lig_coords + shift, L=L)
        lig = _volume(lig_coords, L=L)
        res = dock_sweep(rec, lig, jnp.eye(3)[None], top_k=4, chunk=1)
        np.testing.assert_array_equal(np.asarray(res.shifts[0]),
                                      shift.astype(int))
        assert int(res.rot_idx[0]) == 0

    def test_planted_rotation_and_translation(self):
        # Rotate+shift the "receptor" copy; sweep over a small rotation
        # set containing the true rotation.
        L = 20
        rng = np.random.default_rng(1)
        lig_coords = rng.uniform(-5, 5, (12, 3)).astype(np.float32)
        R_true = axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]),
                                      jnp.array(np.pi / 2))
        shift = np.array([1.0, 2.0, -2.0], dtype=np.float32)
        rec = _volume(np.asarray(rotate(jnp.asarray(lig_coords), R_true))
                      + shift, L=L)
        lig = _volume(lig_coords, L=L)
        angles = [0.0, np.pi / 2, np.pi, 3 * np.pi / 2]
        rots = jnp.stack([axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]),
                                               jnp.array(a))
                          for a in angles])
        res = dock_sweep(rec, lig, rots, top_k=4, chunk=2)
        assert int(res.rot_idx[0]) == 1
        np.testing.assert_array_equal(np.asarray(res.shifts[0]),
                                      shift.astype(int))

    def test_matches_unfused_reference(self):
        # Streaming top-K == materialize-everything oracle.
        L, C, n_rot = 12, 2, 6
        rng = np.random.default_rng(2)
        rec = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        lig = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        A = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32))
        from deeplocalproteindocking_tpu.structure.so3 import (
            super_fibonacci_rotations)
        rots = super_fibonacci_rotations(n_rot)
        res = dock_sweep(rec, lig, rots, A, top_k=8, chunk=4)

        H = receptor_transform(rec, A)
        S_all = jax.vmap(lambda v: correlate_scores(H, v))(
            rotate_volumes(lig, rots))           # [n_rot, L, L, L]
        flat = np.asarray(S_all).reshape(-1)
        order = np.argsort(-flat)[:8]
        want_scores = flat[order]
        np.testing.assert_allclose(np.asarray(res.scores), want_scores,
                                   rtol=1e-4, atol=1e-4)
        want_rot = order // (L ** 3)
        np.testing.assert_array_equal(np.asarray(res.rot_idx), want_rot)

    def test_rotation_padding_masked(self):
        # n_rot not divisible by chunk: padded slots must never win.
        L = 8
        rng = np.random.default_rng(3)
        rec = jnp.asarray(rng.normal(size=(L, L, L, 1)).astype(np.float32))
        lig = jnp.asarray(rng.normal(size=(L, L, L, 1)).astype(np.float32))
        from deeplocalproteindocking_tpu.structure.so3 import (
            super_fibonacci_rotations)
        rots = super_fibonacci_rotations(5)
        res = dock_sweep(rec, lig, rots, top_k=64, chunk=4)
        assert int(res.rot_idx.max()) < 5
        assert np.isfinite(np.asarray(res.scores)).all()

    def test_score_mask(self):
        L = 8
        rng = np.random.default_rng(4)
        rec = jnp.asarray(rng.normal(size=(L, L, L, 1)).astype(np.float32))
        lig = rec
        from deeplocalproteindocking_tpu.correlate import translation_mask
        mask = translation_mask(L, 1)
        res = dock_sweep(rec, lig, jnp.eye(3)[None], top_k=4, chunk=1,
                         score_mask=mask)
        assert int(jnp.abs(res.shifts).max()) <= 1


class TestCouplingRankTruncation:
    """config.coupling_rank: SVD-truncated coupling (round-3 perf
    lever: ligand-side channel count r < C in the correlator)."""

    def test_rank2_exact_for_shape_coupling(self):
        """The analytic shape coupling has rank 2, so coupling_rank=2
        must reproduce the full scoring exactly."""
        import numpy as np
        from deeplocalproteindocking_tpu.config import DockConfig
        from deeplocalproteindocking_tpu.data import synthetic_complex
        from deeplocalproteindocking_tpu.pipeline import DockingPipeline
        cplx = synthetic_complex(seed=4, n_res_rec=8, n_res_lig=4)
        base = dict(grid_size=32, resolution=1.25, num_rotations=8,
                    rotation_chunk=4, top_k=8, rep_features=(8,))
        a = DockingPipeline(config=DockConfig(**base))
        b = DockingPipeline(config=DockConfig(coupling_rank=2, **base))
        pa = a.dock_complex(cplx, cluster=False)
        pb = b.dock_complex(cplx, cluster=False)
        np.testing.assert_allclose(pa.scores, pb.scores, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(pa.rot_idx, pb.rot_idx)

    def test_full_rank_is_noop_and_learned_truncation_close(self):
        import numpy as np
        from deeplocalproteindocking_tpu.config import DockConfig
        from deeplocalproteindocking_tpu.data import synthetic_complex
        from deeplocalproteindocking_tpu.pipeline import DockingPipeline
        cplx = synthetic_complex(seed=5, n_res_rec=8, n_res_lig=4)
        base = dict(grid_size=32, resolution=1.25, num_rotations=6,
                    rotation_chunk=2, top_k=4, rep_features=(8, 8))
        a = DockingPipeline(config=DockConfig(**base))
        a.init_params(seed=2)
        full = DockingPipeline(config=DockConfig(coupling_rank=8,
                                                 **base))
        full.params = a.params
        pa = a.dock_complex(cplx, cluster=False)
        pf = full.dock_complex(cplx, cluster=False)
        np.testing.assert_allclose(pa.scores, pf.scores, rtol=1e-5)
        # identity coupling truncated to rank 7: scores shift but stay
        # finite and ranked
        tr = DockingPipeline(config=DockConfig(coupling_rank=7, **base))
        tr.params = a.params
        pt = tr.dock_complex(cplx, cluster=False)
        assert np.isfinite(pt.scores).all()
        assert np.all(np.diff(pt.scores) <= 1e-5)

    def test_rescore_respects_truncation(self):
        import numpy as np
        from deeplocalproteindocking_tpu.config import DockConfig
        from deeplocalproteindocking_tpu.data import synthetic_complex
        from deeplocalproteindocking_tpu.pipeline import DockingPipeline
        cplx = synthetic_complex(seed=4, n_res_rec=8, n_res_lig=4)
        base = dict(grid_size=32, resolution=1.25, num_rotations=8,
                    rotation_chunk=4, top_k=8, rep_features=(8,))
        a = DockingPipeline(config=DockConfig(**base))
        b = DockingPipeline(config=DockConfig(coupling_rank=2, **base))
        pa = a.dock_complex(cplx)
        ra = a.rescore(cplx.receptor, cplx.ligand, pa, top=2, nrot=8)
        rb = b.rescore(cplx.receptor, cplx.ligand, pa, top=2, nrot=8)
        np.testing.assert_allclose(ra.scores[:2], rb.scores[:2],
                                   rtol=1e-4, atol=1e-4)

    def test_folded_rep_fn_equals_projection(self):
        """_folded_rep_fn (V_r folded into the last conv) must equal
        represent(vols) @ V_r for hybrid (bias-free) and plain
        (biased) models."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from deeplocalproteindocking_tpu.config import DockConfig
        from deeplocalproteindocking_tpu.pipeline import DockingPipeline
        rng = np.random.default_rng(0)
        vols = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 11))
                           .astype(np.float32))
        for sp in (True, False):
            cfg = DockConfig(grid_size=16, rep_features=(8, 6),
                             shape_prior=sp, coupling_rank=3)
            pipe = DockingPipeline(config=cfg)
            pipe.init_params(seed=3)
            C = 6 + (2 if sp else 0)
            proj = jnp.asarray(
                rng.normal(size=(C, 3)).astype(np.float32))
            folded = pipe._folded_rep_fn(proj)
            assert folded is not None, sp
            want = jnp.einsum(
                "...c,cr->...r",
                pipe.model.apply({"params": pipe.params}, vols,
                                 method=pipe.model.represent), proj)
            got = folded(vols)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want),
                                       rtol=2e-4, atol=2e-4)
