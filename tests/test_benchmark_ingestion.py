"""DB4/DB5-layout ingestion end-to-end with MIXED formats (P6/P9).

The real Docking Benchmark mount is empty (external blocker), so this
is the strongest available evidence for the ingestion path: a
benchmark directory in the reference's ``<code>_{r,l}_{u,b}`` naming,
one complex as legacy PDB and one as PDBx/mmCIF, discovered with
list_benchmark, loaded with load_complex (format dispatch + typing),
and pushed through the resumable benchmark runner.
"""
import json
import os

import numpy as np
import pytest

from deeplocalproteindocking_tpu.config import DockConfig
from deeplocalproteindocking_tpu.data import synthetic_complex
from deeplocalproteindocking_tpu.data.benchmark import (
    list_benchmark, load_complex)
from deeplocalproteindocking_tpu.structure.pdb import write_pdb


def _write_cif(path, s):
    rows = ["data_t", "loop_"] + [
        "_atom_site.%s" % c for c in
        ("group_PDB", "auth_atom_id", "auth_comp_id", "auth_asym_id",
         "auth_seq_id", "Cartn_x", "Cartn_y", "Cartn_z", "occupancy")]
    for k in range(len(s.coords)):
        rows.append(
            f"ATOM {s.atom_names[k]} {s.res_names[k]} "
            f"{s.chain_ids[k]} {s.res_ids[k]} "
            f"{s.coords[k, 0]:.3f} {s.coords[k, 1]:.3f} "
            f"{s.coords[k, 2]:.3f} 1.00")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.fixture()
def db_dir(tmp_path):
    a = synthetic_complex(seed=160, backbone=True, unbound_rmsd=1.0)
    b = synthetic_complex(seed=161, backbone=True, unbound_rmsd=1.0)
    # complex "aaaa" as legacy PDB, "bbbb" as mmCIF — bound AND
    # unbound variants, the u/b situation of the real benchmark.
    for tag, c in [("aaaa", a), ("bbbb", b)]:
        for kind in ("u", "b"):
            rs = c.receptor
            ls = c.ligand
            if tag == "aaaa":
                write_pdb(str(tmp_path / f"{tag}_r_{kind}.pdb"), rs)
                write_pdb(str(tmp_path / f"{tag}_l_{kind}.pdb"), ls)
            else:
                _write_cif(tmp_path / f"{tag}_r_{kind}.cif", rs)
                _write_cif(tmp_path / f"{tag}_l_{kind}.cif", ls)
    return tmp_path


def test_mixed_format_discovery_and_load(db_dir):
    codes = list_benchmark(str(db_dir))
    assert codes == ["aaaa", "bbbb"]
    for code in codes:
        for bound in (False, True):
            c = load_complex(str(db_dir), code, bound=bound)
            assert len(c.receptor.coords) > 50
            assert len(c.ligand.coords) > 20
            assert c.receptor.types.max() < 11
    # PDB and mmCIF variants of the same structure agree atom-for-atom
    pdb_c = load_complex(str(db_dir), "aaaa")
    assert pdb_c.name == "aaaa"


def test_benchmark_runner_over_ingested_dir(db_dir, tmp_path):
    from deeplocalproteindocking_tpu.evaluation import run_benchmark
    from deeplocalproteindocking_tpu.pipeline import DockingPipeline
    cfg = DockConfig(grid_size=32, resolution=1.25, rep_features=(8,),
                     num_rotations=8, rotation_chunk=8, top_k=8)
    pipe = DockingPipeline(config=cfg)
    cplxs = [load_complex(str(db_dir), code)
             for code in list_benchmark(str(db_dir))]
    out = tmp_path / "results"
    summary = run_benchmark(pipe, cplxs, str(out))
    assert summary["num_complexes"] == 2
    # per-complex result files written (resume granularity)
    for code in ("aaaa", "bbbb"):
        rec = json.load(open(out / f"{code}.json"))
        assert np.isfinite(rec["best_lrmsd"])
