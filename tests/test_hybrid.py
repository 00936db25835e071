"""Hybrid shape-prior model: untrained == shape complementarity.

The flagship model family concatenates analytic (surface, core)
channels with learned CNN channels; the coupling init puts the
canonical shape coupling in the prior block and ZEROS elsewhere, so an
untrained hybrid must reproduce the shape-mode pipeline EXACTLY — the
ranking loss then improves from that zero point (the round-2 answer to
"learned must beat shape at global docking")."""
import numpy as np

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.data import synthetic_complex
from deeplocalproteindocking_tpu.pipeline import DockingPipeline


class TestHybridShapePrior:
    def test_untrained_hybrid_equals_shape_mode(self):
        cplx = synthetic_complex(seed=4, n_res_rec=10, n_res_lig=5)
        base = dict(grid_size=32, resolution=1.5, num_rotations=8,
                    rotation_chunk=4, top_k=8)
        shape_pipe = DockingPipeline(config=DockConfig(
            rep_features=(4,), **base))          # params=None: shape mode
        hybrid_pipe = DockingPipeline(config=DockConfig(
            rep_features=(8, 4), shape_prior=True, **base))
        hybrid_pipe.init_params(seed=0)
        a = shape_pipe.dock_complex(cplx, cluster=False)
        b = hybrid_pipe.dock_complex(cplx, cluster=False)
        np.testing.assert_allclose(b.scores, a.scores, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_array_equal(b.rot_idx, a.rot_idx)
        np.testing.assert_array_equal(b.shifts, a.shifts)

    def test_hybrid_coupling_init_blocks(self):
        from deeplocalproteindocking_tpu.models.scoring import (
            ScoringModel)
        import jax
        import jax.numpy as jnp
        m = ScoringModel(features=(8, 4), shape_prior=True)
        dummy = jnp.zeros((8, 8, 8, 11))
        params = m.init(jax.random.key(0), dummy, dummy)["params"]
        c = np.asarray(params["coupling"])
        assert c.shape == (6, 6)
        np.testing.assert_allclose(c[:2, :2], [[1.0, 0.0], [0.0, -12.0]])
        assert np.all(c[2:, :] == 0) and np.all(c[:, 2:] == 0)

    def test_hybrid_trains(self):
        import jax
        from deeplocalproteindocking_tpu.train import Trainer
        from deeplocalproteindocking_tpu.train.data_gen import (
            make_training_batch)
        # Huge margin keeps the hinge active even though the shape
        # prior already ranks these easy decoys correctly.
        cfg = DockConfig(grid_size=24, resolution=1.5,
                         rep_features=(4,), shape_prior=True,
                         num_decoys=8, batch_complexes=2,
                         hinge_margin=500.0,
                         splat_window=4, rotation_chunk=4)
        tr = Trainer(cfg)
        state = tr.init_state()
        cplxs = [synthetic_complex(seed=s, n_res_rec=6, n_res_lig=3)
                 for s in range(2)]
        batch = make_training_batch(jax.random.key(0), cplxs, cfg)
        c0 = np.asarray(state.params["coupling"]).copy()
        state, m = tr.train_step(state, batch)
        assert np.isfinite(float(np.asarray(m["loss"])))
        c1 = np.asarray(state.params["coupling"])
        # The learned coupling blocks move off zero within one step.
        assert np.abs(c1 - c0).max() > 0
