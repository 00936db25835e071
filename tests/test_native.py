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


class TestNativeCifTokenizer:
    """C++ CIF tokenizer (native/cif_tokenizer.cpp) == pure Python."""

    CASES = [
        # plain loop
        "loop_\n_atom_site.group_PDB\n_atom_site.id\nATOM 1\nATOM 2\n",
        # quoted strings, trailing comment, semicolon block containing
        # keyword-looking lines (the round-2 desync case)
        ("data_x\n_t 'a b' \"c'd\"  # trail\n"
         ";block line1\nloop_ inside\n_tag fake\n;\nnext 1 2\n"),
        # comments, blank lines, '#' mid-token is data
        "# c\n\n  _k   v1 v2#data\n",
        # unterminated quote runs to EOL
        '_q "open quote runs\n',
        # unterminated semicolon block runs to EOF
        ";unterminated\nline2",
        # quote closes only before whitespace (embedded quotes = data)
        "mix 'q1'x 'q2' end\n",
        # wrapped rows + stop_ + CRLF
        "loop_\r\n_a.x\r\n_a.y\r\n1\r\n2\r\n3 4\r\nstop_\r\n",
        "",
    ]

    def test_token_stream_parity(self):
        cif_native = pytest.importorskip(
            "deeplocalproteindocking_tpu.native.cif_native")
        from deeplocalproteindocking_tpu.structure.mmcif import (
            _tokenize_cif_py)
        for i, text in enumerate(self.CASES):
            assert (cif_native.tokenize_cif(text)
                    == _tokenize_cif_py(text)), f"case {i}"

    def test_structure_parity_through_parse(self, tmp_path):
        # Full parse equality on a synthetic complex written as mmCIF:
        # native tokens -> same Structure as pure-Python tokens.
        pytest.importorskip(
            "deeplocalproteindocking_tpu.native.cif_native")
        import numpy as np
        from deeplocalproteindocking_tpu.data import synthetic_complex
        from deeplocalproteindocking_tpu.structure import mmcif as M
        from deeplocalproteindocking_tpu.structure.pdb import write_pdb
        from deeplocalproteindocking_tpu.structure.mmcif import (
            parse_mmcif_text)
        c = synthetic_complex(seed=7, backbone=True)
        pdb_path = tmp_path / "r.pdb"
        write_pdb(str(pdb_path), c.receptor)
        # Build a minimal mmCIF from the structure's fields.
        s = c.receptor
        rows = ["data_synth", "loop_", "_atom_site.group_PDB",
                "_atom_site.auth_atom_id", "_atom_site.auth_comp_id",
                "_atom_site.auth_asym_id", "_atom_site.auth_seq_id",
                "_atom_site.Cartn_x", "_atom_site.Cartn_y",
                "_atom_site.Cartn_z", "_atom_site.occupancy"]
        for k in range(len(s.coords)):
            rows.append(
                f"ATOM {s.atom_names[k]} {s.res_names[k]} "
                f"{s.chain_ids[k]} {s.res_ids[k]} "
                f"{s.coords[k,0]:.3f} {s.coords[k,1]:.3f} "
                f"{s.coords[k,2]:.3f} 1.00")
        text = "\n".join(rows) + "\n"
        fast = parse_mmcif_text(text)          # native tokens
        M._native_tokenize = False             # force Python tokens
        try:
            slow = parse_mmcif_text(text)
        finally:
            M._native_tokenize = None
        np.testing.assert_array_equal(fast.coords, slow.coords)
        assert list(fast.atom_names) == list(slow.atom_names)
        assert list(fast.types) == list(slow.types)
        assert len(fast.coords) == len(s.coords)

    def test_fuzz_parity(self):
        # Random CIF-ish soup: every byte-level decision (quotes,
        # comments, blocks, CRLF, wrapped rows) must agree with the
        # pure-Python reference on arbitrary input, not just
        # well-formed files.
        cif_native = pytest.importorskip(
            "deeplocalproteindocking_tpu.native.cif_native")
        from deeplocalproteindocking_tpu.structure.mmcif import (
            _tokenize_cif_py)
        import random
        rng = random.Random(0)
        pieces = ["loop_", "_a.x", "_atom_site.id", "ATOM", "1.5",
                  "'q v'", '"d q"', "#c", ";", ";blk", "?", ".",
                  "ab'c", 'x"y', "stop_", "data_z", "  ", "\t", "#",
                  "'unterm", '"', "'"]
        for trial in range(200):
            n = rng.randrange(1, 40)
            parts = []
            for _ in range(n):
                parts.append(rng.choice(pieces))
                parts.append(rng.choice([" ", " ", "\n", "\r\n", "\t"]))
            text = "".join(parts)
            a = _tokenize_cif_py(text)
            b = cif_native.tokenize_cif(text)
            assert a == b, (trial, text[:120], a[:5], b[:5])

    def test_atom_site_fuzz_parity(self):
        # Random _atom_site tables: column subsets/order, './?' cells,
        # HETATM rows, multiple models, quoted atom ids, truncated
        # final rows — the native parse must equal the pure-Python one
        # structure-for-structure.
        pytest.importorskip(
            "deeplocalproteindocking_tpu.native.cif_native")
        import random
        import numpy as np
        from deeplocalproteindocking_tpu.structure import mmcif as M
        rng = random.Random(1)
        all_cols = ["group_PDB", "auth_atom_id", "label_atom_id",
                    "auth_comp_id", "auth_asym_id", "auth_seq_id",
                    "label_seq_id", "Cartn_x", "Cartn_y", "Cartn_z",
                    "occupancy", "label_alt_id", "pdbx_PDB_ins_code",
                    "pdbx_PDB_model_num"]
        atoms = ["N", "CA", "C", "O", "CB", '"C5\'"', "OXT"]
        ress = ["ALA", "GLY", "LYS", "HOH"]
        for trial in range(40):
            cols = [c for c in all_cols if rng.random() < 0.8]
            if not any(c.startswith("Cartn") for c in cols):
                cols += ["Cartn_x", "Cartn_y", "Cartn_z"]
            rng.shuffle(cols)
            rows = ["data_f", "loop_"] + [f"_atom_site.{c}"
                                          for c in cols]
            for r in range(rng.randrange(1, 25)):
                cells = []
                for c in cols:
                    if rng.random() < 0.12:
                        # './?' are CIF nulls; an empty-quoted token is
                        # a present-but-empty VALUE (round-4 ADVICE:
                        # empty auth_seq_id must skip the row via
                        # int(''), empty group_PDB must fail the
                        # ATOM/HETATM filter — in BOTH parsers).
                        cells.append(rng.choice(
                            [".", "?", "''", '""']))
                    elif c == "group_PDB":
                        cells.append(rng.choice(
                            ["ATOM", "ATOM", "HETATM", "TER"]))
                    elif "atom_id" in c:
                        cells.append(rng.choice(atoms))
                    elif "comp_id" in c:
                        cells.append(rng.choice(ress))
                    elif "asym_id" in c:
                        cells.append(rng.choice("AB"))
                    elif "seq_id" in c:
                        cells.append(str(rng.randrange(1, 60)))
                    elif c.startswith("Cartn"):
                        cells.append(rng.choice(
                            [f"{rng.uniform(-20, 20):.3f}", "bad"]
                            if rng.random() < 0.05
                            else [f"{rng.uniform(-20, 20):.3f}"]))
                    elif c == "occupancy":
                        cells.append(rng.choice(["1.00", "0.50", "x"]))
                    elif c == "label_alt_id":
                        cells.append(rng.choice([".", "A", "B"]))
                    elif c == "pdbx_PDB_ins_code":
                        cells.append(rng.choice([".", "A"]))
                    else:
                        cells.append(str(1 + rng.randrange(2)))
                rows.append(" ".join(cells))
            text = "\n".join(rows) + "\n"
            if rng.random() < 0.2:           # truncated final row
                text = text.rsplit(" ", 2)[0] + "\n"
            for het in (False, True):
                fast = M.parse_mmcif_text(text, include_hetatm=het)
                M._native_tokenize = False
                try:
                    slow = M.parse_mmcif_text(text, include_hetatm=het)
                finally:
                    M._native_tokenize = None
                assert len(fast.coords) == len(slow.coords), (
                    trial, het, text[:300])
                np.testing.assert_array_equal(fast.coords, slow.coords)
                assert list(fast.atom_names) == list(slow.atom_names)
                assert list(fast.res_ids) == list(slow.res_ids)
                assert list(fast.types) == list(slow.types)
