import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.data import synthetic_complex
from deeplocalproteindocking_tpu.train import (
    Trainer, generate_decoys, ranking_hinge_loss,
)
from deeplocalproteindocking_tpu.train.data_gen import (
    make_training_batch, native_voxel_shift,
)


def tiny_cfg(**kw):
    base = dict(grid_size=24, resolution=1.5, rep_features=(6, 4),
                num_decoys=6, batch_complexes=2, num_rotations=4,
                decoy_max_shift=4.0, decoy_max_angle_deg=40.0)
    base.update(kw)
    return DockConfig(**base)


class TestDecoys:
    def test_native_included_and_labels(self):
        lig = jnp.asarray(
            np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32))
        lig = lig - lig.mean(0)
        mask = jnp.ones(8)
        nat = jnp.array([2, -1, 0], dtype=jnp.int32)
        d = generate_decoys(jax.random.key(0), lig, mask, nat, n=10,
                            resolution=1.5, max_angle=0.5, max_shift=5.0)
        assert d.rotations.shape == (10, 3, 3)
        assert float(d.lrmsd[0]) < 1e-4       # decoy 0 = native
        np.testing.assert_array_equal(np.asarray(d.shifts[0]), [2, -1, 0])
        assert float(d.lrmsd[1:].min()) >= 0.0
        assert np.isfinite(np.asarray(d.lrmsd)).all()

    def test_lrmsd_label_matches_direct(self):
        lig = jnp.asarray(
            np.random.default_rng(1).normal(size=(6, 3)).astype(np.float32))
        lig = lig - lig.mean(0)
        nat = jnp.array([0, 0, 0], dtype=jnp.int32)
        d = generate_decoys(jax.random.key(1), lig, jnp.ones(6), nat, n=4,
                            resolution=1.0, max_angle=0.8, max_shift=3.0)
        from deeplocalproteindocking_tpu.structure.transforms import apply_pose
        from deeplocalproteindocking_tpu.utils.rmsd import rmsd
        i = 2
        posed = apply_pose(lig, d.rotations[i],
                           d.shifts[i].astype(jnp.float32))
        want = float(rmsd(posed, lig))
        np.testing.assert_allclose(float(d.lrmsd[i]), want, rtol=1e-4)


class TestLoss:
    def test_perfect_ranking_zero_loss(self):
        scores = jnp.array([10.0, 1.0, 0.0])
        lrmsd = jnp.array([1.0, 20.0, 30.0])
        loss = ranking_hinge_loss(scores, lrmsd, near_native_rmsd=5.0,
                                  margin=1.0)
        assert float(loss) == 0.0

    def test_inverted_ranking_positive_loss(self):
        scores = jnp.array([0.0, 10.0])
        lrmsd = jnp.array([1.0, 20.0])
        loss = ranking_hinge_loss(scores, lrmsd)
        assert float(loss) == 11.0  # margin 1 - (0 - 10)

    def test_no_positives_gives_zero(self):
        loss = ranking_hinge_loss(jnp.array([1.0, 2.0]),
                                  jnp.array([20.0, 30.0]))
        assert float(loss) == 0.0


class TestTrainer:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg()
        trainer = Trainer(cfg)
        state = trainer.init_state()
        cplxs = [synthetic_complex(seed=s, n_res_rec=6, n_res_lig=3)
                 for s in range(3)]
        batch = make_training_batch(jax.random.key(0), cplxs, cfg)
        return cfg, trainer, state, batch

    def test_batch_shapes(self, setup):
        cfg, _, _, batch = setup
        B, D = cfg.batch_complexes, cfg.num_decoys
        assert batch.decoy_rot.shape == (B, D, 3, 3)
        assert batch.decoy_shift.shape == (B, D, 3)
        assert batch.rec_coords.shape[0] == B

    def test_train_step_reduces_loss(self, setup):
        cfg, trainer, state, batch = setup
        losses = []
        for _ in range(8):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # same batch -> must overfit

    def test_grads_nonzero_through_stack(self, setup):
        cfg, trainer, state, batch = setup
        grads = jax.grad(lambda p: trainer.loss_fn(p, batch)[0])(
            state.params)
        norms = jax.tree.map(lambda g: float(jnp.abs(g).max()), grads)
        flat = jax.tree.leaves(norms)
        assert any(v > 0 for v in flat), norms

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        cfg, trainer, state, batch = setup
        state2, _ = trainer.train_step(state, batch)
        trainer.save(str(tmp_path), state2)
        restored = trainer.restore(str(tmp_path))
        assert int(restored.step) == int(state2.step)
        a = jax.tree.leaves(state2.params)
        b = jax.tree.leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_native_voxel_shift(self):
        c = synthetic_complex(seed=0, n_res_rec=6, n_res_lig=3)
        s = native_voxel_shift(c, 1.5)
        want = np.round((c.ligand.center - c.receptor.center) / 1.5)
        np.testing.assert_array_equal(s, want.astype(np.int32))


class TestRankingAccuracy:
    def test_accuracy_values(self):
        import jax.numpy as jnp
        from deeplocalproteindocking_tpu.train.losses import (
            pairwise_ranking_accuracy)
        scores = jnp.array([3.0, 2.0, 1.0])
        lrmsd = jnp.array([1.0, 20.0, 30.0])   # first is near-native
        assert float(pairwise_ranking_accuracy(scores, lrmsd)) == 1.0
        assert float(pairwise_ranking_accuracy(-scores, lrmsd)) == 0.0


class TestAugmentation:
    def test_labels_invariant_under_augmentation(self):
        # Joint rotation must not change the decoy LRMSD distribution's
        # validity: all labels finite, native decoy still ~0.
        import jax
        from deeplocalproteindocking_tpu.data import synthetic_complex
        from deeplocalproteindocking_tpu.train.data_gen import (
            make_training_batch)
        cfg = tiny_cfg(augment_rotations=True)
        cplxs = [synthetic_complex(seed=s, n_res_rec=6, n_res_lig=3)
                 for s in range(3)]
        batch = make_training_batch(jax.random.key(3), cplxs, cfg)
        lr = np.asarray(batch.decoy_lrmsd)
        assert np.isfinite(lr).all()
        assert (lr[:, 0] < 1.5).all()   # native decoy, voxel-snap error


class TestGlobalDecoysAndMining:
    def test_merge_mined_accumulates_and_caps(self):
        from deeplocalproteindocking_tpu.train.decoys import DecoySet
        from deeplocalproteindocking_tpu.train.mining import merge_mined

        def ds(n, tag):
            return DecoySet(
                rotations=np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
                shifts=np.full((n, 3), tag, np.float32),
                lrmsd=np.full((n,), tag, np.float32))

        buf = merge_mined(None, {"a": ds(4, 1.0)})
        buf = merge_mined(buf, {"a": ds(4, 2.0), "b": ds(2, 3.0)})
        assert len(buf["a"].lrmsd) == 8          # accumulated, not replaced
        assert set(np.unique(buf["a"].lrmsd)) == {1.0, 2.0}
        assert len(buf["b"].lrmsd) == 2
        buf = merge_mined(buf, {"a": ds(4, 4.0)}, cap=6)
        assert len(buf["a"].lrmsd) == 6          # capped, most recent kept
        assert buf["a"].lrmsd[-1] == 4.0 and 1.0 not in buf["a"].lrmsd[2:]

    def test_lr_decay_schedule_in_trainer(self):
        import optax
        from deeplocalproteindocking_tpu.config import DockConfig
        from deeplocalproteindocking_tpu.train.trainer import Trainer
        cfg = DockConfig(grid_size=16, rep_features=(4,), num_decoys=4,
                         batch_complexes=1, learning_rate=1e-3,
                         lr_decay_steps=100, weight_decay=1e-4)
        t = Trainer(cfg)
        # The optimizer carries the cosine schedule: its hyperparams
        # at step 100 decay to alpha=10% of the base lr.
        sched = optax.cosine_decay_schedule(1e-3, 100, alpha=0.1)
        assert float(sched(100)) == pytest.approx(1e-4)
        assert t.optimizer is not None  # built without error

    def test_global_decoys_cover_so3_and_box(self):
        import jax
        from deeplocalproteindocking_tpu.train.decoys import (
            generate_global_decoys)
        lig = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 3)).astype(np.float32)) * 2.0
        mask = jnp.ones(8, jnp.float32)
        nat = jnp.zeros(3, jnp.int32)
        d = generate_global_decoys(jax.random.key(0), lig, mask, nat,
                                   n=128, resolution=1.5,
                                   max_shift_vox=6)
        # Shifts span the full allowed cube, rotations far from identity.
        s = np.asarray(d.shifts)
        assert s.max() == 6 and s.min() == -6
        traces = np.trace(np.asarray(d.rotations), axis1=1, axis2=2)
        assert traces.min() < 0.0  # rotations beyond any small cone
        assert np.asarray(d.lrmsd).max() > 10.0

    def test_mined_buffer_feeds_batch_and_labels_hold(self):
        import jax
        from deeplocalproteindocking_tpu.data import synthetic_complex
        from deeplocalproteindocking_tpu.train.data_gen import (
            make_training_batch)
        from deeplocalproteindocking_tpu.train.mining import (
            mine_hard_negatives)
        from deeplocalproteindocking_tpu.train.trainer import Trainer
        from deeplocalproteindocking_tpu.structure.transforms import (
            apply_pose)
        from deeplocalproteindocking_tpu.utils.rmsd import rmsd as _rmsd
        cfg = DockConfig(grid_size=24, resolution=1.5, rep_features=(4,),
                         num_decoys=8, batch_complexes=2,
                         decoy_global_frac=0.25, splat_window=4,
                         rotation_chunk=4)
        tr = Trainer(cfg)
        state = tr.init_state()
        cplxs = [synthetic_complex(seed=s, n_res_rec=6, n_res_lig=3)
                 for s in range(2)]
        mined = mine_hard_negatives(tr.model, state.params, cfg, cplxs,
                                    n_rotations=8, top_k=8)
        assert set(mined) == {c.name for c in cplxs}
        b = make_training_batch(jax.random.key(1), cplxs, cfg,
                                mined=mined)
        assert b.decoy_shift.dtype == jnp.float32
        assert b.decoy_rot.shape == (2, cfg.num_decoys, 3, 3)
        # Every decoy's LRMSD label must equal the geometric LRMSD of
        # its (R, s) pose in the (possibly augmented) batch frame.
        for bi in range(2):
            lc, lm = b.lig_coords[bi], b.lig_mask[bi]
            # Native pose: the batch's own decoy 0 is the native.
            posed = apply_pose(lc[None], b.decoy_rot[bi],
                               b.decoy_shift[bi] * cfg.resolution)
            native = apply_pose(lc[None], b.decoy_rot[bi, :1],
                                b.decoy_shift[bi, :1] * cfg.resolution)
            got = _rmsd(posed, native,
                        jnp.broadcast_to(lm[None], posed.shape[:-1]))
            # Mined labels reference the TRUE native placement; the
            # batch's decoy-0 native is lattice-snapped — tolerate the
            # sub-voxel difference (<= resolution * sqrt(3) / 2).
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(b.decoy_lrmsd[bi]),
                                       atol=1.5 * cfg.resolution)

    def test_train_step_with_mined_runs(self):
        import jax
        from deeplocalproteindocking_tpu.data import synthetic_complex
        from deeplocalproteindocking_tpu.train.data_gen import (
            make_training_batch)
        from deeplocalproteindocking_tpu.train.mining import (
            mine_hard_negatives)
        from deeplocalproteindocking_tpu.train.trainer import Trainer
        cfg = DockConfig(grid_size=24, resolution=1.5, rep_features=(4,),
                         num_decoys=8, batch_complexes=2,
                         decoy_global_frac=0.4, splat_window=4,
                         rotation_chunk=4)
        tr = Trainer(cfg)
        state = tr.init_state()
        cplxs = [synthetic_complex(seed=s, n_res_rec=6, n_res_lig=3)
                 for s in range(2)]
        mined = mine_hard_negatives(tr.model, state.params, cfg, cplxs,
                                    n_rotations=8, top_k=8)
        b = make_training_batch(jax.random.key(0), cplxs, cfg,
                                mined=mined)
        state, m = tr.train_step(state, b)
        assert np.isfinite(float(np.asarray(m["loss"])))
