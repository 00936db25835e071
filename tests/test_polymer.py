"""Bond-geometry sanity checks for the polymer synthetic generator.

Round-2 VERDICT #5: "Done = generator output passes a bond-geometry
sanity check and the learned-vs-shape conclusion survives the harder
fixtures."  These tests are that check: real covalent backbone geometry,
rotamer-built side chains, steric sanity, compactness, determinism, and
the carve/unbound protocol on top.
"""
import numpy as np
import pytest

from deeplocalproteindocking_tpu.data.benchmark import synthetic_complex
from deeplocalproteindocking_tpu.data.polymer import polymer_chain


def _chain(seed=0, n=40):
    return polymer_chain(np.random.default_rng(seed), n)


class TestBackboneGeometry:
    def test_backbone_bond_lengths(self):
        s = _chain()
        ca = s.coords[s.atom_names == "CA"]
        N = s.coords[s.atom_names == "N"]
        C = s.coords[s.atom_names == "C"]
        O = s.coords[s.atom_names == "O"]
        d_ca = np.linalg.norm(np.diff(ca, axis=0), axis=1)
        np.testing.assert_allclose(d_ca, 3.8, atol=0.02)
        np.testing.assert_allclose(
            np.linalg.norm(N - ca, axis=1), 1.46, atol=0.05)
        np.testing.assert_allclose(
            np.linalg.norm(C - ca, axis=1), 1.52, atol=0.05)
        # trans peptide bond C(i)-N(i+1)
        np.testing.assert_allclose(
            np.linalg.norm(C[:-1] - N[1:], axis=1), 1.33, atol=0.05)
        np.testing.assert_allclose(
            np.linalg.norm(C - O, axis=1), 1.23, atol=0.05)

    def test_ca_virtual_angle_range(self):
        s = _chain(seed=1)
        ca = s.coords[s.atom_names == "CA"]
        v1 = ca[:-2] - ca[1:-1]
        v2 = ca[2:] - ca[1:-1]
        cosang = (v1 * v2).sum(1) / (
            np.linalg.norm(v1, axis=1) * np.linalg.norm(v2, axis=1))
        ang = np.rad2deg(np.arccos(np.clip(cosang, -1, 1)))
        assert ang.min() > 75.0 and ang.max() < 150.0

    def test_cb_length_and_chirality(self):
        s = _chain(seed=2)
        for rid in np.unique(s.res_ids):
            r = s.select(s.res_ids == rid)
            byname = dict(zip(r.atom_names, r.coords))
            if "CB" not in byname:
                continue
            d = np.linalg.norm(byname["CB"] - byname["CA"])
            assert abs(d - 1.53) < 0.05
            # consistent L-chirality: same sign of the triple product
            e1 = byname["N"] - byname["CA"]
            e2 = byname["C"] - byname["CA"]
            e3 = byname["CB"] - byname["CA"]
            assert np.dot(np.cross(e2, e1), e3) > 0


class TestSideChains:
    def test_sidechain_connectivity(self):
        """Every side-chain atom bonds (<1.95 A) to something in its
        residue; no intra-residue pair overlaps (<1.0 A)."""
        s = _chain(seed=3)
        for rid in np.unique(s.res_ids):
            r = s.select(s.res_ids == rid)
            D = np.linalg.norm(
                r.coords[:, None] - r.coords[None], axis=-1)
            np.fill_diagonal(D, 99.0)
            assert D.min() > 1.0
            side = ~np.isin(r.atom_names, ["N", "CA", "C", "O"])
            assert (D[side] < 1.95).any(axis=1).all()

    def test_all_atoms_typed(self):
        s = _chain(seed=4)
        assert (s.types >= 0).all()

    def test_rotamer_diversity(self):
        """chi1 varies across residues (side chains are sampled, not a
        canned template)."""
        s = _chain(seed=5, n=60)
        chis = []
        for rid in np.unique(s.res_ids):
            r = s.select(s.res_ids == rid)
            byname = dict(zip(r.atom_names, r.coords))
            g = next((a for a in ("CG", "CG1", "OG", "SG")
                      if a in byname), None)
            if g is None:
                continue
            b1 = byname["CA"] - byname["N"]
            b2 = byname["CB"] - byname["CA"]
            b3 = byname[g] - byname["CB"]
            n1 = np.cross(b1, b2)
            n2 = np.cross(b2, b3)
            chi = np.arctan2(
                np.dot(np.cross(n1, n2), b2 / np.linalg.norm(b2)),
                np.dot(n1, n2))
            chis.append(np.rad2deg(chi))
        assert np.std(chis) > 40.0      # spread over rotamer wells


class TestStericsAndShape:
    def test_no_sequence_distant_clash(self):
        for seed in range(6):
            s = _chain(seed=seed)
            D = np.linalg.norm(
                s.coords[:, None] - s.coords[None], axis=-1)
            np.fill_diagonal(D, 99.0)
            dd = np.abs(s.res_ids[:, None] - s.res_ids[None])
            assert np.where(dd >= 2, D, 99.0).min() > 2.0, seed

    def test_compact(self):
        for seed, n in [(0, 30), (1, 45), (2, 60)]:
            s = _chain(seed=seed, n=n)
            ca = s.coords[s.atom_names == "CA"]
            rg = float(np.sqrt(((ca - ca.mean(0)) ** 2).sum(1).mean()))
            assert rg < 4.2 * n ** (1.0 / 3.0), (seed, n, rg)

    def test_deterministic(self):
        a = _chain(seed=7)
        b = _chain(seed=7)
        np.testing.assert_array_equal(a.coords, b.coords)
        assert (a.res_names == b.res_names).all()


class TestCarveProtocol:
    def test_backbone_complex(self):
        c = synthetic_complex(seed=11, n_res_rec=14, n_res_lig=7,
                              backbone=True)
        assert len(c.receptor) > 0 and len(c.ligand) > 0
        assert (c.ligand.chain_ids == "B").all()
        # carve is complete and disjoint
        rec_res = set(map(int, c.receptor.res_ids))
        lig_res = set(map(int, c.ligand.res_ids))
        assert not (rec_res & lig_res)
        assert len(rec_res) == 14 and len(lig_res) == 7

    def test_unbound_backbone_rmsd(self):
        b = synthetic_complex(seed=11, n_res_rec=14, n_res_lig=7,
                              backbone=True)
        u = synthetic_complex(seed=11, n_res_rec=14, n_res_lig=7,
                              backbone=True, unbound_rmsd=1.2)
        d = np.linalg.norm(u.ligand.coords - b.ligand.coords, axis=1)
        rms = float(np.sqrt((d ** 2).mean()))
        assert 0.6 < rms < 1.8          # ~target deformation

    def test_docks_end_to_end(self):
        """Shape-mode global dock of a polymer complex finds a
        reasonable pose (smoke: the new fixtures feed the full stack)."""
        from deeplocalproteindocking_tpu.config import DockConfig
        from deeplocalproteindocking_tpu.evaluation import (
            evaluate_complex)
        from deeplocalproteindocking_tpu.pipeline import DockingPipeline
        cfg = DockConfig(grid_size=48, resolution=1.25,
                         num_rotations=96, top_k=32, rotation_chunk=16)
        pipe = DockingPipeline(config=cfg)
        cplx = synthetic_complex(seed=12, n_res_rec=12, n_res_lig=6,
                                 backbone=True)
        res = evaluate_complex(pipe, cplx)
        assert res["num_poses"] > 0
        assert res["best_lrmsd"] < 12.0
