"""Minimal mmCIF (PDBx) ingestion: atom_site records -> Structure.

The reference's loader handles legacy PDB only
[U: TorchProteinLibrary/Layers/FullAtomModel/cPDBLoader.cpp — mount
empty, unverified]; modern archives distribute PDBx/mmCIF, so real
Docking Benchmark inputs may arrive in either format (round-1 VERDICT
"what's missing" #3).  This parser reads the ``_atom_site`` loop —
the only category the docking pipeline needs — with the same semantics
as the PDB path:

* ATOM records (HETATM optional), NMR model selection by
  ``pdbx_PDB_model_num`` (first model by default),
* occupancy-based alternate-location selection via the shared
  ``structure.pdb.select_altlocs`` helper,
* auth_* identifiers preferred (they match the legacy PDB columns),
  falling back to label_* when absent.

Pure host-side Python: parsing is once-per-complex, off every hot path
(SURVEY.md §2.1 N1).
"""
from __future__ import annotations

import os
import shlex

import numpy as np

from deeplocalproteindocking_tpu.structure.atom_types import (
    assign_atom_types,
)
from deeplocalproteindocking_tpu.structure.pdb import (
    Structure, select_altlocs,
)


def _split_cif_line(line: str):
    """mmCIF values are whitespace-separated; quoted values may contain
    spaces.  shlex handles both quote styles used by atom_site rows."""
    if "'" in line or '"' in line:
        try:
            return shlex.split(line)
        except ValueError:
            return line.split()
    return line.split()


def parse_mmcif_text(text: str, include_hetatm: bool = False,
                     model: int = 1) -> Structure:
    """Parse ``_atom_site``; ``model`` selects the Nth distinct
    ``pdbx_PDB_model_num`` in file order (1-based, default first)."""
    lines = text.splitlines()
    names, ress, chains, rids, icds, xyz = [], [], [], [], [], []
    alts, occs = [], []
    models_seen: list = []

    i = 0
    n = len(lines)
    while i < n:
        if lines[i].strip() != "loop_":
            i += 1
            continue
        # Collect the loop's column headers.
        j = i + 1
        cols = []
        while j < n and lines[j].startswith("_"):
            cols.append(lines[j].strip().split()[0])
            j += 1
        if not cols or not cols[0].startswith("_atom_site."):
            i = j
            continue
        idx = {c.split(".", 1)[1]: k for k, c in enumerate(cols)}

        def col(row, *keys, default=None):
            for k in keys:
                p = idx.get(k)
                if p is not None and p < len(row):
                    v = row[p]
                    if v not in (".", "?"):
                        return v
            return default

        while j < n:
            raw = lines[j].strip()
            if (not raw or raw.startswith("#") or raw.startswith("_")
                    or raw == "loop_" or raw.startswith("data_")):
                break
            row = _split_cif_line(raw)
            j += 1
            if len(row) < len(cols):
                continue
            rec = col(row, "group_PDB", default="ATOM")
            if rec == "HETATM" and not include_hetatm:
                continue
            if rec not in ("ATOM", "HETATM"):
                continue
            m = col(row, "pdbx_PDB_model_num", default="1")
            if m not in models_seen:
                models_seen.append(m)
            if models_seen.index(m) + 1 != model:
                continue  # not the requested NMR model
            try:
                x = float(col(row, "Cartn_x"))
                y = float(col(row, "Cartn_y"))
                z = float(col(row, "Cartn_z"))
                rid = int(col(row, "auth_seq_id", "label_seq_id",
                              default="0"))
            except (TypeError, ValueError):
                continue
            try:
                occ = float(col(row, "occupancy", default="1.0"))
            except ValueError:
                occ = 1.0
            names.append(col(row, "auth_atom_id", "label_atom_id",
                             default="").strip('"').strip("'"))
            ress.append(col(row, "auth_comp_id", "label_comp_id",
                            default=""))
            chains.append(col(row, "auth_asym_id", "label_asym_id",
                              default="A"))
            rids.append(rid)
            icds.append(col(row, "pdbx_PDB_ins_code", default="") or "")
            alts.append(col(row, "label_alt_id", default="") or "")
            xyz.append((x, y, z))
            occs.append(occ)
        i = j

    if model > 1 and model > len(models_seen):
        raise ValueError(
            f"model {model} requested but the file has only "
            f"{len(models_seen)} distinct pdbx_PDB_model_num value(s)")
    keep = select_altlocs(names, chains, rids, icds, alts, occs)
    coords = np.asarray(xyz, dtype=np.float32).reshape(-1, 3)[keep]
    atom_names = np.asarray([names[k] for k in keep], dtype="<U4")
    res_names = np.asarray([ress[k] for k in keep], dtype="<U3")
    return Structure(
        coords=coords,
        atom_names=atom_names,
        res_names=res_names,
        res_ids=np.asarray([rids[k] for k in keep], dtype=np.int32),
        chain_ids=np.asarray([chains[k] for k in keep], dtype="<U1"),
        types=assign_atom_types(res_names, atom_names),
        icodes=np.asarray([icds[k] for k in keep], dtype="<U1"),
    )


def parse_mmcif(path: str | os.PathLike,
                include_hetatm: bool = False, model: int = 1) -> Structure:
    with open(path) as f:
        return parse_mmcif_text(f.read(), include_hetatm=include_hetatm,
                                model=model)


def parse_structure(path: str | os.PathLike,
                    include_hetatm: bool = False,
                    model: int = 1) -> Structure:
    """Format-dispatching loader: .cif/.mmcif -> mmCIF, else PDB.

    ``model`` selects the Nth NMR model (1-based) in either format.
    """
    from deeplocalproteindocking_tpu.structure.pdb import parse_pdb
    p = str(path)
    if p.lower().endswith((".cif", ".mmcif")):
        return parse_mmcif(p, include_hetatm=include_hetatm, model=model)
    return parse_pdb(p, include_hetatm=include_hetatm, model=model)
