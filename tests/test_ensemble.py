"""NMR multi-model ensemble docking (model enumeration + merged sweep).

Reference analog: the reference docks single conformers
[U: DeepLocalProteinDocking/Docking — mount empty, unverified];
multi-model ensembles extend the same rigid pipeline across the
conformational spread of NMR depositions.
"""
import json
import os

import numpy as np
import pytest

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.data import synthetic_complex
from deeplocalproteindocking_tpu.pipeline import DockingPipeline
from deeplocalproteindocking_tpu.structure.mmcif import (
    count_models, count_models_mmcif_text,
)
from deeplocalproteindocking_tpu.structure.pdb import (
    count_models_pdb_text, parse_pdb_text, write_pdb,
)

MMCIF_TWO_MODELS = """\
data_test
loop_
_atom_site.group_PDB
_atom_site.auth_atom_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM CA ALA A 1 1.0 2.0 3.0 1
ATOM CB ALA A 1 2.0 2.0 3.0 1
ATOM CA ALA A 1 1.1 2.1 3.1 2
ATOM CB ALA A 1 2.1 2.1 3.1 2
"""


def _multi_model_pdb_text(structures):
    """Wrap each structure's ATOM records in MODEL/ENDMDL blocks."""
    import io
    import tempfile
    blocks = []
    for k, s in enumerate(structures):
        with tempfile.NamedTemporaryFile("r", suffix=".pdb") as f:
            write_pdb(f.name, s)
            body = [ln for ln in open(f.name).read().splitlines()
                    if ln.startswith("ATOM")]
        blocks.append(f"MODEL     {k + 1}\n" + "\n".join(body)
                      + "\nENDMDL")
    return "\n".join(blocks) + "\nEND\n"


class TestCountModels:
    def test_pdb(self):
        assert count_models_pdb_text("ATOM      1  CA  ALA A   1    "
                                     "   1.000   2.000   3.000") == 1
        c = synthetic_complex(seed=0, n_res_rec=3, n_res_lig=2)
        text = _multi_model_pdb_text([c.ligand, c.ligand, c.ligand])
        assert count_models_pdb_text(text) == 3
        # The parser and the counter agree on selectability.
        s3 = parse_pdb_text(text, model=3)
        assert len(s3) == len(c.ligand)
        with pytest.raises(ValueError):
            parse_pdb_text(text, model=4)

    def test_mmcif(self):
        assert count_models_mmcif_text(MMCIF_TWO_MODELS) == 2
        no_col = "\n".join(ln for ln in MMCIF_TWO_MODELS.splitlines()
                           if "model_num" not in ln)
        no_col = "\n".join(ln.rsplit(" ", 1)[0] if ln.startswith("ATOM")
                           else ln for ln in no_col.splitlines())
        assert count_models_mmcif_text(no_col) == 1

    def test_dispatch(self, tmp_path):
        c = synthetic_complex(seed=1, n_res_rec=3, n_res_lig=2)
        p = tmp_path / "two.pdb"
        p.write_text(_multi_model_pdb_text([c.ligand, c.ligand]))
        assert count_models(str(p)) == 2
        q = tmp_path / "two.cif"
        q.write_text(MMCIF_TWO_MODELS)
        assert count_models(str(q)) == 2


class TestDockEnsemble:
    def _pipe(self):
        cfg = DockConfig(grid_size=32, resolution=1.5,
                         rep_features=(4,), num_rotations=4,
                         rotation_chunk=2, top_k=8, splat_window=4,
                         fft_impl="dft", nms_rmsd=3.0)
        return DockingPipeline(config=cfg)

    def test_merge_ranked_and_tagged(self):
        import dataclasses
        pipe = self._pipe()
        c = synthetic_complex(seed=2, n_res_rec=6, n_res_lig=3)
        lig2 = dataclasses.replace(c.ligand)
        rng = np.random.default_rng(0)
        lig2.coords = (c.ligand.coords
                       + rng.normal(0, 0.3, c.ligand.coords.shape)
                       ).astype(np.float32)
        poses, pairs = pipe.dock_ensemble([c.receptor],
                                          [c.ligand, lig2])
        assert len(poses) == len(pairs) and pairs.shape[1] == 2
        assert np.all(np.diff(poses.scores) <= 1e-5)
        assert set(np.unique(pairs[:, 0])) <= {0}
        assert set(np.unique(pairs[:, 1])) <= {0, 1}
        # Merged top-1 == best single-pair top-1 (union semantics).
        singles = [pipe.dock(c.receptor, l, cluster=False).scores[0]
                   for l in (c.ligand, lig2)]
        np.testing.assert_allclose(poses.scores[0], max(singles),
                                   rtol=1e-5)

    def test_product_preps_r_plus_l(self):
        """Round-4: a product ensemble voxelizes R + L structures, not
        R x L — the receptor half (voxelize + rep + FFT) is computed
        once per model and pairs sweep as one batched program."""
        import dataclasses
        pipe = self._pipe()
        c = synthetic_complex(seed=6, n_res_rec=6, n_res_lig=3)
        rng = np.random.default_rng(1)

        def jiggle(s):
            s2 = dataclasses.replace(s)
            s2.coords = (s.coords + rng.normal(0, 0.2, s.coords.shape)
                         ).astype(np.float32)
            return s2

        recs = [c.receptor, jiggle(c.receptor)]
        ligs = [c.ligand, jiggle(c.ligand), jiggle(c.ligand)]
        calls = []
        orig = DockingPipeline.voxelize
        pipe.voxelize = lambda s, *a, **k: (calls.append(1),
                                            orig(pipe, s, *a, **k))[1]
        poses, pairs = pipe.dock_ensemble(recs, ligs)
        # Only the R receptor halves voxelize; ligand models are
        # device-padded directly (the sweep splats them per-rotation).
        assert len(calls) == len(recs)
        assert len(poses) == len(pairs)
        # Every receptor and ligand model index can appear.
        assert set(np.unique(pairs[:, 0])) <= {0, 1}
        assert set(np.unique(pairs[:, 1])) <= {0, 1, 2}
        # Merged top-1 == best single-pair top-1 (union semantics).
        singles = [pipe.dock(r, l, cluster=False).scores[0]
                   for r in recs for l in ligs]
        np.testing.assert_allclose(poses.scores[0], max(singles),
                                   rtol=1e-5)

    def test_pair_batch_memory_bound(self):
        """Auto pair_batch scales with the per-pair receptor tensor:
        flagship-size spectra (128^3, C=16, complex64, ~136 MB each)
        must batch in single digits, small grids keep the cap, and the
        floor is 1 (round-4 VERDICT #6 / ADVICE medium: a fixed 32
        stacked >4 GB of spectra at the flagship grid)."""
        import jax
        import jax.numpy as jnp
        from deeplocalproteindocking_tpu.pipeline import (
            ensemble_pair_batch)
        big = jax.ShapeDtypeStruct((128, 128, 65, 16), jnp.complex64)
        small = jax.ShapeDtypeStruct((32, 32, 17, 2), jnp.complex64)
        huge = jax.ShapeDtypeStruct((256, 256, 129, 16), jnp.complex64)
        assert 1 <= ensemble_pair_batch(big) <= 8
        assert ensemble_pair_batch(small) == 32
        assert ensemble_pair_batch(huge) == 1

    def test_chunk_scales_with_pair_batch(self):
        """The in-scan rotation chunk passed to the batched pair sweep
        shrinks by the per-device pair count (the memory-amplification
        rule shared with rescore and batched eval)."""
        from unittest import mock
        from deeplocalproteindocking_tpu.parallel import batch_eval
        pipe = self._pipe()
        c = synthetic_complex(seed=7, n_res_rec=5, n_res_lig=3)
        seen = {}
        orig = batch_eval.dock_batch

        def spy(*a, **k):
            seen["chunk"] = k.get("chunk")
            return orig(*a, **k)

        with mock.patch.object(batch_eval, "dock_batch", side_effect=spy):
            pipe.dock_ensemble([c.receptor, c.receptor],
                               [c.ligand, c.ligand])
        # 4 pairs on one device, rotation_chunk=2 -> chunk max(1, 2//4).
        assert seen["chunk"] == 1

    def test_chunk_follows_actual_mesh_decision(self):
        """The chunk scale uses the per-DEVICE pair count of the mesh
        decision actually taken per batch: a pair count divisible by
        the mesh batch axis shards (per_dev = B / mesh_batch); a
        non-divisible one falls back to vmap with ALL B pairs on every
        device, so the chunk must shrink by B (round-5 review: scaling
        the fallback by B/mesh_batch re-opens the per-device
        memory-amplification crash class)."""
        import jax
        from unittest import mock
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        from deeplocalproteindocking_tpu.parallel import (
            batch_eval, make_mesh)
        cfg = DockConfig(grid_size=32, resolution=1.5,
                         rep_features=(4,), num_rotations=4,
                         rotation_chunk=4, top_k=8, splat_window=4,
                         fft_impl="dft", nms_rmsd=3.0)
        pipe = DockingPipeline(config=cfg, mesh=make_mesh(rot=4, batch=2))
        c = synthetic_complex(seed=7, n_res_rec=5, n_res_lig=3)
        calls = []
        orig = batch_eval.dock_batch

        def spy(mesh_arg, *a, **k):
            calls.append((mesh_arg is not None, k.get("chunk")))
            return orig(mesh_arg, *a, **k)

        with mock.patch.object(batch_eval, "dock_batch",
                               side_effect=spy):
            # B=2 divides mesh batch 2 -> sharded, per_dev=1, chunk=4.
            pipe.dock_ensemble([c.receptor], [c.ligand, c.ligand])
            # B=3 does not -> vmap fallback, per_dev=3, chunk=4//3=1.
            pipe.dock_ensemble([c.receptor], [c.ligand] * 3)
        assert calls[0] == (True, 4)
        assert calls[1] == (False, 1)

    def test_zip_pairing_validation(self):
        pipe = self._pipe()
        c = synthetic_complex(seed=3, n_res_rec=5, n_res_lig=3)
        with pytest.raises(ValueError, match="zip"):
            pipe.dock_ensemble([c.receptor],
                               [c.ligand, c.ligand], pairing="zip")
        poses, pairs = pipe.dock_ensemble([c.receptor], [c.ligand],
                                          pairing="zip")
        assert np.all(pairs == 0)


class TestCLIEnsemble:
    def test_dock_ensemble_flag(self, tmp_path):
        from deeplocalproteindocking_tpu.cli import main
        c = synthetic_complex(seed=4, n_res_rec=6, n_res_lig=3)
        rec_p = tmp_path / "rec.pdb"
        lig_p = tmp_path / "lig.pdb"
        write_pdb(str(rec_p), c.receptor)
        lig_p.write_text(_multi_model_pdb_text([c.ligand, c.ligand]))
        out = str(tmp_path / "poses")
        main(["dock", "--receptor", str(rec_p), "--ligand", str(lig_p),
              "--out", out, "--ensemble", "product",
              "--grid-size", "32", "--resolution", "1.5",
              "--num-rotations", "4", "--top-k", "4",
              "--num-out", "2"])
        table = json.load(open(os.path.join(out, "poses.json")))
        assert table and table[0]["ligand_model"] in (1, 2)
        assert table[0]["receptor_model"] == 1
        assert os.path.exists(os.path.join(out, "pose_000.pdb"))

    def test_ensemble_rejects_rescore(self, tmp_path):
        from deeplocalproteindocking_tpu.cli import main
        c = synthetic_complex(seed=5, n_res_rec=5, n_res_lig=3)
        rec_p, lig_p = tmp_path / "r.pdb", tmp_path / "l.pdb"
        write_pdb(str(rec_p), c.receptor)
        write_pdb(str(lig_p), c.ligand)
        with pytest.raises(SystemExit):
            main(["dock", "--receptor", str(rec_p), "--ligand",
                  str(lig_p), "--out", str(tmp_path / "o"),
                  "--ensemble", "product", "--rescore-top", "4"])
