"""C++ parser parity with the pure-Python parser."""
import numpy as np
import pytest

from deeplocalproteindocking_tpu.data import synthetic_complex
from deeplocalproteindocking_tpu.structure.pdb import (
    parse_pdb_text, write_pdb,
)

pdb_native = pytest.importorskip(
    "deeplocalproteindocking_tpu.native.pdb_native")


HETATM_SNIPPET = """\
ATOM      1  N   MET A   1      27.340  24.430   2.614  1.00  0.00
ATOM      2  CA BMET A   1      26.266  25.413   2.842  1.00  0.00
HETATM    3  O   HOH A 100      10.000  10.000  10.000  1.00  0.00
ENDMDL
ATOM      4  CB  MET A   1      25.112  24.880   3.649  1.00  0.00
"""

# Two altlocs of the same CA: B has the higher occupancy and must win;
# the lone N has no competition.
ALTLOC_SNIPPET = """\
ATOM      1  N   MET A   1      27.340  24.430   2.614  1.00  0.00
ATOM      2  CA AMET A   1      26.266  25.413   2.842  0.40  0.00
ATOM      3  CA BMET A   1      26.500  25.600   2.900  0.60  0.00
"""


class TestNativeParser:
    def test_parity_on_synthetic(self, tmp_path):
        c = synthetic_complex(seed=0, n_res_rec=10, n_res_lig=5)
        p = tmp_path / "rec.pdb"
        write_pdb(p, c.receptor)
        fast = pdb_native.parse_pdb(str(p))
        with open(p) as f:
            slow = parse_pdb_text(f.read())
        np.testing.assert_array_equal(fast.coords, slow.coords)
        assert list(fast.atom_names) == list(slow.atom_names)
        assert list(fast.res_names) == list(slow.res_names)
        assert list(fast.res_ids) == list(slow.res_ids)
        assert list(fast.chain_ids) == list(slow.chain_ids)
        assert list(fast.types) == list(slow.types)

    def test_altloc_endmdl_hetatm_rules(self, tmp_path):
        p = tmp_path / "t.pdb"
        p.write_text(HETATM_SNIPPET)
        fast = pdb_native.parse_pdb(str(p))
        slow = parse_pdb_text(HETATM_SNIPPET)
        # Lone altloc B kept (it's the only CA), HETATM skipped,
        # ENDMDL stops: 2 atoms.
        assert len(fast) == len(slow) == 2
        fast_h = pdb_native.parse_pdb(str(p), include_hetatm=True)
        slow_h = parse_pdb_text(HETATM_SNIPPET, include_hetatm=True)
        assert len(fast_h) == len(slow_h) == 3

    def test_occupancy_based_altloc_selection(self, tmp_path):
        p = tmp_path / "alt.pdb"
        p.write_text(ALTLOC_SNIPPET)
        for s in (pdb_native.parse_pdb(str(p)),
                  parse_pdb_text(ALTLOC_SNIPPET)):
            assert len(s) == 2
            assert list(s.atom_names) == ["N", "CA"]
            # The 0.60-occupancy B conformer wins, at CA's first-seen
            # position (after N).
            np.testing.assert_allclose(
                s.coords[1], [26.5, 25.6, 2.9], atol=1e-4)

    def test_truncated_record_skipped(self, tmp_path):
        text = ("ATOM      1  CA  MET A   1      27.340  24.430\n"
                "ATOM      2  CA  GLY A   2      1.000   2.000   3.000"
                "  1.00  0.00\n")
        p = tmp_path / "trunc.pdb"
        p.write_text(text)
        for s in (pdb_native.parse_pdb(str(p)), parse_pdb_text(text)):
            assert len(s) == 1
            assert list(s.res_names) == ["GLY"]

    def test_dispatch_from_parse_pdb(self, tmp_path):
        # structure.pdb.parse_pdb should route through the native lib
        # when available and produce identical results either way.
        from deeplocalproteindocking_tpu.structure.pdb import parse_pdb
        c = synthetic_complex(seed=1, n_res_rec=6, n_res_lig=3)
        p = tmp_path / "x.pdb"
        write_pdb(p, c.ligand)
        s = parse_pdb(p)
        assert len(s) == len(c.ligand)

    def test_insertion_codes(self, tmp_path):
        text = (
            "ATOM      1  CA  MET A  10      1.000   2.000   3.000"
            "  1.00  0.00\n"
            "ATOM      2  CA  GLY A  10A     4.000   5.000   6.000"
            "  1.00  0.00\n")
        p = tmp_path / "ic.pdb"
        p.write_text(text)
        slow = parse_pdb_text(text)
        fast = pdb_native.parse_pdb(str(p))
        assert list(slow.icodes) == ["", "A"]
        assert list(fast.icodes) == ["", "A"]
        assert list(slow.res_ids) == [10, 10]
        # residue identity separates on the insertion code
        from deeplocalproteindocking_tpu.evaluation import _dense_res_ids
        assert len(set(_dense_res_ids(slow))) == 2
