import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeplocalproteindocking_tpu.structure import (
    NUM_ATOM_TYPES, assign_atom_types, parse_pdb_text, write_pdb, parse_pdb,
    rotate, translate, apply_pose, center_of_mass, bounding_box,
    quat_to_matrix, random_rotations, axis_angle_to_matrix,
    super_fibonacci_rotations, local_rotations, geodesic_angle,
)
from deeplocalproteindocking_tpu.structure.atom_types import (
    _SIDECHAIN, _BACKBONE, type_histogram,
)
from deeplocalproteindocking_tpu.data import synthetic_complex


PDB_SNIPPET = """\
ATOM      1  N   MET A   1      27.340  24.430   2.614  1.00  0.00
ATOM      2  CA  MET A   1      26.266  25.413   2.842  1.00  0.00
ATOM      3  C   MET A   1      26.913  26.639   3.531  1.00  0.00
ATOM      4  O   MET A   1      27.886  26.463   4.263  1.00  0.00
ATOM      5  CB  MET A   1      25.112  24.880   3.649  1.00  0.00
ATOM      6  SD  MET A   1      23.930  23.959   2.641  1.00  0.00
ATOM      7  H   MET A   1      27.282  23.521   3.027  1.00  0.00
HETATM    8  O   HOH A 100      10.000  10.000  10.000  1.00  0.00
ATOM      9  N   GLY B   2      26.335  27.770   3.258  1.00  0.00
"""


class TestAtomTypes:
    def test_full_table_coverage(self):
        # Every heavy atom of all 20 residues maps to a valid type.
        for res, side in _SIDECHAIN.items():
            atoms = list(_BACKBONE) + list(side)
            t = assign_atom_types([res] * len(atoms), atoms)
            assert (t >= 0).all() and (t < NUM_ATOM_TYPES).all(), res

    def test_chemistry(self):
        t = assign_atom_types(
            ["LYS", "ARG", "ASP", "SER", "CYS", "HIS", "GLY"],
            ["NZ", "NH1", "OD1", "OG", "SG", "ND1", "CA"])
        from deeplocalproteindocking_tpu.structure.atom_types import (
            N_AMMO, N_GUA, O_CARBOXYL, O_HYDROXYL, SULFUR, N_ARO, C_SP3)
        assert list(t) == [N_AMMO, N_GUA, O_CARBOXYL, O_HYDROXYL,
                           SULFUR, N_ARO, C_SP3]

    def test_unknown_is_negative(self):
        t = assign_atom_types(["HOH", "MET"], ["O", "H1"])
        assert (t == -1).all()


class TestPDB:
    def test_parse_snippet(self):
        s = parse_pdb_text(PDB_SNIPPET)
        assert len(s) == 8  # hydrogens kept at parse, HOH excluded (HETATM)
        assert s.atom_names[0] == "N"
        assert s.res_names[0] == "MET"
        np.testing.assert_allclose(s.coords[0], [27.340, 24.430, 2.614],
                                   atol=1e-4)
        typed = s.typed()
        assert len(typed) == 7  # drops H
        assert set(typed.chain_ids) == {"A", "B"}
        assert len(typed.chains(["B"])) == 1

    def test_write_parse_roundtrip(self, tmp_path):
        c = synthetic_complex(seed=1, n_res_rec=5, n_res_lig=3)
        p = tmp_path / "rec.pdb"
        write_pdb(p, c.receptor)
        s2 = parse_pdb(p)
        np.testing.assert_allclose(s2.coords, c.receptor.coords, atol=2e-3)
        assert list(s2.atom_names) == list(c.receptor.atom_names)
        assert list(s2.types) == list(c.receptor.types)

    def test_type_histogram(self):
        s = parse_pdb_text(PDB_SNIPPET).typed()
        h = type_histogram(s.types)
        assert h.sum() == 7 and h.shape == (NUM_ATOM_TYPES,)


class TestTransforms:
    def test_quat_rotations_orthogonal(self):
        R = random_rotations(jax.random.key(0), 64)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye,
                                   atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(64), atol=1e-5)

    def test_rotate_translate(self):
        x = jax.random.normal(jax.random.key(1), (10, 3))
        R = axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]),
                                 jnp.array(np.pi / 2))
        y = rotate(x, R)
        # 90 deg about z: (x, y, z) -> (-y, x, z)
        np.testing.assert_allclose(y[:, 0], -x[:, 1], atol=1e-5)
        np.testing.assert_allclose(y[:, 1], x[:, 0], atol=1e-5)
        t = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(apply_pose(x, R, t), y + t, atol=1e-6)

    def test_center_and_bbox_masked(self):
        x = jnp.array([[0.0, 0, 0], [2, 2, 2], [100, 100, 100]])
        mask = jnp.array([1.0, 1.0, 0.0])
        np.testing.assert_allclose(center_of_mass(x, mask), [1, 1, 1])
        lo, hi = bounding_box(x, mask)
        np.testing.assert_allclose(lo, [0, 0, 0])
        np.testing.assert_allclose(hi, [2, 2, 2])


class TestSO3:
    def test_super_fibonacci_valid(self):
        R = super_fibonacci_rotations(1000)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye,
                                   atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(1000),
                                   atol=1e-5)

    def test_super_fibonacci_covers(self):
        # Every random rotation should have a neighbor within ~2x the
        # expected covering radius for n=4608 (~17 deg).
        R = super_fibonacci_rotations(4608)
        probes = random_rotations(jax.random.key(2), 50)
        ang = geodesic_angle(probes[:, None], R[None])
        assert float(ang.min(axis=1).max()) < np.deg2rad(25)

    def test_local_rotations_in_cone(self):
        base = random_rotations(jax.random.key(3), 1)[0]
        cone = np.deg2rad(30)
        Rs = local_rotations(base, cone, 256)
        ang = geodesic_angle(Rs, base[None])
        assert float(ang.max()) <= cone + 1e-3
        assert float(ang.min()) >= 0.0
        # determinism
        Rs2 = local_rotations(base, cone, 256)
        np.testing.assert_array_equal(np.asarray(Rs), np.asarray(Rs2))

    def test_geodesic_angle(self):
        R = axis_angle_to_matrix(jnp.array([1.0, 0, 0]), jnp.array(0.7))
        a = geodesic_angle(R, jnp.eye(3))
        np.testing.assert_allclose(a, 0.7, atol=1e-5)


class TestSplits:
    def test_split_benchmark(self):
        from deeplocalproteindocking_tpu.data.benchmark import (
            split_benchmark)
        codes = [f"c{i:03d}" for i in range(200)]
        sp = split_benchmark(codes)
        assert sorted(sp["train"] + sp["val"] + sp["test"]) == sorted(codes)
        assert 100 < len(sp["train"]) < 180
        # determinism + stability under growth
        sp2 = split_benchmark(codes)
        assert sp == sp2
        sp3 = split_benchmark(codes + ["zzz"])
        for n in ("train", "val", "test"):
            assert set(sp[n]) <= set(sp3[n])


class TestUnboundProtocol:
    """synthetic_complex(unbound_rmsd=...) — the DB-style unbound mode."""

    def test_deformation_rmsd_and_determinism(self):
        from deeplocalproteindocking_tpu.data.benchmark import (
            synthetic_complex)
        b = synthetic_complex(seed=3, n_res_rec=14, n_res_lig=7)
        u = synthetic_complex(seed=3, n_res_rec=14, n_res_lig=7,
                              unbound_rmsd=1.5)
        u2 = synthetic_complex(seed=3, n_res_rec=14, n_res_lig=7,
                               unbound_rmsd=1.5)
        assert np.array_equal(u.receptor.coords, u2.receptor.coords)
        assert np.array_equal(u.ligand.coords, u2.ligand.coords)
        for bs, us in ((b.receptor, u.receptor), (b.ligand, u.ligand)):
            assert len(bs) == len(us)
            rms = float(np.sqrt(
                ((bs.coords - us.coords) ** 2).sum(1).mean()))
            assert abs(rms - 1.5) < 1e-4
            # In-place deformation: no net translation, so the native
            # placement (and its LRMSD-0 grading) is preserved.
            assert np.abs(bs.coords.mean(0)
                          - us.coords.mean(0)).max() < 1e-4

    def test_deformation_is_smooth(self):
        # A coherent low-frequency field: neighboring atoms move
        # together, so relative displacements between close atom pairs
        # are much smaller than the absolute RMSD.
        from deeplocalproteindocking_tpu.data.benchmark import (
            synthetic_complex)
        b = synthetic_complex(seed=11, n_res_rec=16, n_res_lig=8)
        u = synthetic_complex(seed=11, n_res_rec=16, n_res_lig=8,
                              unbound_rmsd=1.5)
        c, d = b.receptor.coords, u.receptor.coords - b.receptor.coords
        dist = np.linalg.norm(c[:, None] - c[None], axis=-1)
        i, j = np.nonzero((dist > 0) & (dist < 3.0))
        rel = np.linalg.norm(d[i] - d[j], axis=1).mean()
        assert rel < 0.5  # vs 1.5 A absolute RMS (i.i.d. noise: ~2.1)


class TestDeviceArrays:
    def test_structure_to_device_padding_and_overflow(self):
        from deeplocalproteindocking_tpu.data.benchmark import (
            structure_to_device)
        c = synthetic_complex(seed=0, n_res_rec=5, n_res_lig=3)
        n = len(c.receptor.typed())
        coords, types, mask = structure_to_device(c.receptor, n + 4)
        assert coords.shape == (n + 4, 3)
        assert float(mask.sum()) == n
        assert int(types[-1]) == -1
        with pytest.raises(ValueError):
            structure_to_device(c.receptor, n - 1)
