"""mmCIF ingestion: atom_site loop, altlocs, multi-model, dispatch."""
import numpy as np

from deeplocalproteindocking_tpu.structure.mmcif import (
    parse_mmcif_text, parse_structure,
)
from deeplocalproteindocking_tpu.structure.pdb import parse_pdb_text


CIF = """\
data_test
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.pdbx_PDB_model_num
ATOM 1 N . MET A 1 ? 27.340 24.430 2.614 1.00 1
ATOM 2 CA A MET A 1 ? 26.266 25.413 2.842 0.40 1
ATOM 3 CA B MET A 1 ? 26.500 25.600 2.900 0.60 1
HETATM 4 O . HOH A 100 ? 10.000 10.000 10.000 1.00 1
ATOM 5 N . MET A 1 ? 0.000 0.000 0.000 1.00 2
#
"""

PDB_EQUIV = """\
ATOM      1  N   MET A   1      27.340  24.430   2.614  1.00  0.00
ATOM      2  CA AMET A   1      26.266  25.413   2.842  0.40  0.00
ATOM      3  CA BMET A   1      26.500  25.600   2.900  0.60  0.00
"""


class TestMMCIF:
    def test_atom_site_parse_with_altloc_and_models(self):
        s = parse_mmcif_text(CIF)
        # N + winning CA altloc; HETATM skipped; model 2 skipped.
        assert len(s) == 2
        assert list(s.atom_names) == ["N", "CA"]
        np.testing.assert_allclose(s.coords[1], [26.5, 25.6, 2.9],
                                   atol=1e-4)
        assert list(s.res_names) == ["MET", "MET"]
        assert list(s.chain_ids) == ["A", "A"]

    def test_hetatm_flag(self):
        s = parse_mmcif_text(CIF, include_hetatm=True)
        assert len(s) == 3
        assert "HOH" in list(s.res_names)

    def test_matches_pdb_parser_semantics(self):
        c = parse_mmcif_text(CIF)
        p = parse_pdb_text(PDB_EQUIV)
        np.testing.assert_allclose(c.coords, p.coords, atol=1e-4)
        assert list(c.types) == list(p.types)

    def test_model_selection(self):
        import pytest
        s2 = parse_mmcif_text(CIF, model=2)
        assert len(s2) == 1
        np.testing.assert_allclose(s2.coords[0], [0.0, 0.0, 0.0])
        with pytest.raises(ValueError, match="model 3"):
            parse_mmcif_text(CIF, model=3)

    def test_pdb_model_selection(self):
        import pytest
        multi = ("MODEL        1\n"
                 "ATOM      1  N   MET A   1      27.340  24.430   2.614  1.00  0.00\n"
                 "ENDMDL\n"
                 "MODEL        2\n"
                 "ATOM      1  N   MET A   1       1.000   2.000   3.000  1.00  0.00\n"
                 "ENDMDL\n")
        s1 = parse_pdb_text(multi)                 # default: first model
        np.testing.assert_allclose(s1.coords[0], [27.34, 24.43, 2.614],
                                   atol=1e-4)
        s2 = parse_pdb_text(multi, model=2)
        np.testing.assert_allclose(s2.coords[0], [1.0, 2.0, 3.0])
        with pytest.raises(ValueError, match="model 3"):
            parse_pdb_text(multi, model=3)
        # Single-model file without MODEL records: model=1 works,
        # model=2 is an error, not silently empty.
        s = parse_pdb_text(PDB_EQUIV, model=1)
        assert len(s) == 2
        with pytest.raises(ValueError, match="model 2"):
            parse_pdb_text(PDB_EQUIV, model=2)

    def test_dispatch_by_extension(self, tmp_path):
        f = tmp_path / "x.cif"
        f.write_text(CIF)
        s = parse_structure(f)
        assert len(s) == 2
        g = tmp_path / "y.pdb"
        g.write_text(PDB_EQUIV)
        s2 = parse_structure(g)
        np.testing.assert_allclose(s.coords, s2.coords, atol=1e-4)


class TestCifTokenizerRobustness:
    """Round-3 (round-2 VERDICT weak #4): semicolon text blocks,
    wrapped loop rows, quoted values, trailing comments."""

    _ROW = "ATOM N ASP A 1 ? 1.0 2.0 3.0 1.00 1\n"
    _HDR = """loop_
_atom_site.group_PDB
_atom_site.auth_atom_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.label_alt_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.pdbx_PDB_model_num
"""

    def test_semicolon_block_with_loop_keyword_inside(self):
        """A multi-line text value containing 'loop_' and '_tag' lines
        must not desync the parser."""
        from deeplocalproteindocking_tpu.structure.mmcif import (
            parse_mmcif_text)
        text = ("data_test\n"
                "_struct.pdbx_descriptor\n"
                ";a long description\n"
                "loop_\n"
                "_atom_site.fake\n"
                "more text\n"
                ";\n"
                + self._HDR + self._ROW)
        s = parse_mmcif_text(text)
        assert len(s) == 1
        assert s.atom_names[0] == "N"
        np.testing.assert_allclose(s.coords[0], [1.0, 2.0, 3.0])

    def test_wrapped_loop_rows(self):
        """A row's values legally span lines; consume by count."""
        from deeplocalproteindocking_tpu.structure.mmcif import (
            parse_mmcif_text)
        wrapped = ("ATOM N ASP A 1 ?\n1.0 2.0 3.0\n1.00 1\n"
                   "ATOM CA ASP\nA 1 ? 4.0 5.0 6.0 1.00 1\n")
        s = parse_mmcif_text("data_x\n" + self._HDR + wrapped)
        assert list(s.atom_names) == ["N", "CA"]
        np.testing.assert_allclose(s.coords[1], [4.0, 5.0, 6.0])

    def test_quoted_values_and_trailing_comments(self):
        from deeplocalproteindocking_tpu.structure.mmcif import (
            parse_mmcif_text)
        row = ("ATOM 'N' \"ASP\" A 1 ? 1.0 2.0 3.0 1.00 1 "
               "# trailing comment\n")
        s = parse_mmcif_text("data_x\n" + self._HDR + row)
        assert len(s) == 1
        assert s.res_names[0] == "ASP"

    def test_non_atom_loop_with_quoted_underscore_value(self):
        """A quoted value starting with '_' is data, not a tag."""
        from deeplocalproteindocking_tpu.structure.mmcif import (
            parse_mmcif_text)
        text = ("data_x\n"
                "loop_\n_entity.id\n_entity.details\n"
                "1 '_looks_like_a_tag'\n"
                "2 'loop_'\n"
                + self._HDR + self._ROW)
        s = parse_mmcif_text(text)
        assert len(s) == 1
