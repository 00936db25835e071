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
    """Compact globular mini-protein with valid PDB atom/residue names.

    Residue centers are packed into a ball by min-distance rejection
    sampling (protein-like density ~one residue per (5 A)^3), so the
    voxelized structure has a solid core — required for shape
    complementarity to behave like it does on real proteins.
    """
    res_pool = list(_RES_ATOMS)
    # Ball radius for protein-like packing density.
    radius = 3.2 * n_res ** (1.0 / 3.0)
    centers = []
    while len(centers) < n_res:
        p = rng.uniform(-radius, radius, 3)
        if np.linalg.norm(p) > radius:
            continue
        if centers and np.linalg.norm(
                np.asarray(centers) - p, axis=1).min() < 4.6:
            continue
        centers.append(p)
    names, ress, rids, xyz = [], [], [], []
    for ri, ca in enumerate(centers):
        res = res_pool[rng.integers(len(res_pool))]
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


def _deform(rng: np.random.Generator, s: Structure, rmsd: float,
            lengthscale: float = 8.0, n_modes: int = 4) -> Structure:
    """Smooth conformational perturbation with a target per-atom RMSD.

    A low-frequency Gaussian-RBF displacement field (``n_modes`` random
    centers/amplitudes, width ``lengthscale`` A) is applied to the
    coordinates, with the net translation removed and the magnitude
    normalized so the RMS per-atom displacement equals ``rmsd`` — a
    cheap stand-in for the bound->unbound conformational change of
    Docking Benchmark pairs (loops shift, side chains repack, the fold
    stays).  Smoothness matters: i.i.d. per-atom noise would only blur
    surfaces uniformly, while a coherent field moves whole patches, the
    failure mode that actually breaks rigid shape complementarity.
    """
    if rmsd <= 0.0:
        return s
    c = s.coords.astype(np.float64)
    lo, hi = c.min(0), c.max(0)
    centers = rng.uniform(lo, hi, size=(n_modes, 3))
    amps = rng.normal(size=(n_modes, 3))
    d2 = ((c[:, None, :] - centers[None]) ** 2).sum(-1)
    w = np.exp(-d2 / (2.0 * lengthscale ** 2))
    disp = w @ amps
    disp -= disp.mean(0)                  # keep the native placement
    rms = float(np.sqrt((disp ** 2).sum(1).mean()))
    disp *= rmsd / max(rms, 1e-9)
    return dataclasses.replace(
        s, coords=(c + disp).astype(np.float32))


def synthetic_complex(seed: int = 0, n_res_rec: int = 30,
                      n_res_lig: int = 15,
                      unbound_rmsd: float = 0.0,
                      backbone: bool = False) -> Complex:
    """Deterministic synthetic docked complex (tests / benchmarks).

    One compact globular blob of ``n_res_rec + n_res_lig`` residues is
    generated and *carved* in two: the ligand is the surface chunk of
    ``n_res_lig`` residues nearest a surface seed residue, the receptor
    is the rest.  Their native relative placement reassembles the blob,
    so the native pose is geometrically complementary by construction —
    maximal buried surface with zero core clash — exactly the property
    shape-based docking scores reward on real proteins.  Receptor is
    centered at the origin on return; the ligand keeps its native
    placement relative to it.

    ``unbound_rmsd > 0`` switches to the UNBOUND protocol that the
    reference's benchmark actually uses (DB4/5 docks ``_u`` unbound
    conformers, graded against the bound complex): receptor and ligand
    each get an independent smooth deformation (:func:`_deform`) of
    that per-atom RMSD *in place*, so the native placement still grades
    at ~``unbound_rmsd`` LRMSD but the interface no longer interlocks
    perfectly.  On carved bound complexes shape complementarity is an
    oracle by construction — measured round 2: global top-1 ~0.5-0.6,
    a ceiling no learned correction can beat except by noise; the
    unbound protocol is where a learned, perturbation-robust
    representation can genuinely out-dock the analytic prior.

    ``backbone=True`` builds the chain with real covalent polymer
    geometry (compact self-avoiding CA walk, rigid peptide planes,
    rotamer-sampled side chains — data/polymer.py) instead of the
    round-2 disconnected residue blobs; this is the round-3+ flagship
    protocol (VERDICT r2 #5).  Carving and deformation are identical in
    both modes.
    """
    rng = np.random.default_rng(seed)
    if backbone:
        from deeplocalproteindocking_tpu.data.polymer import polymer_chain
        whole = polymer_chain(rng, n_res_rec + n_res_lig, "A")
    else:
        whole = _random_chain(rng, n_res_rec + n_res_lig, "A")
    # Residue centers = mean of each residue's atoms.
    n_res = n_res_rec + n_res_lig
    res_centers = np.stack([
        whole.coords[whole.res_ids == i + 1].mean(0) for i in range(n_res)])
    blob_center = whole.coords.mean(0)
    depth = np.linalg.norm(res_centers - blob_center, axis=1)
    if backbone:
        # Polymer carve seed at the ~75th depth percentile, NOT the
        # most protruding residue: seeding at the extreme knob gives a
        # shallow native interface that loses to deep false grooves
        # elsewhere on the loosely-packed chain (measured: native
        # scores 40-70% below global top-1 on BOUND fixtures — an
        # adversarial, unrealistic benchmark; real interfaces are
        # pocket-like and competitive).  A mid-depth seed carves a
        # concave, better-interlocked native interface.
        seed_res = int(np.argsort(depth)[int(0.75 * (n_res - 1))])
    else:
        seed_res = int(np.argmax(depth))
    d_to_seed = np.linalg.norm(res_centers - res_centers[seed_res], axis=1)
    lig_res = set((np.argsort(d_to_seed)[:n_res_lig] + 1).tolist())
    lig_mask = np.isin(whole.res_ids, list(lig_res))
    rec = whole.select(~lig_mask)
    lig = whole.select(lig_mask)
    lig.chain_ids = np.full(len(lig), "B", dtype="<U1")
    shift = rec.coords.mean(0)
    rec.coords = rec.coords - shift
    lig.coords = lig.coords - shift
    if unbound_rmsd > 0.0:
        rec = _deform(rng, rec, unbound_rmsd)
        lig = _deform(rng, lig, unbound_rmsd)
    return Complex(name=f"synth{seed}", receptor=rec, ligand=lig)


_STRUCT_EXTS = (".pdb", ".cif", ".mmcif")


def _find_structure(root: str, stem: str) -> str:
    for ext in _STRUCT_EXTS:
        p = os.path.join(root, stem + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"no {stem}.[pdb|cif|mmcif] in {root}")


def load_complex(root: str, code: str, bound: bool = False) -> Complex:
    """Load a DB4/DB5-style pair ``<code>_r_[ub]`` / ``<code>_l_[ub]``
    (legacy PDB or PDBx/mmCIF, by extension)."""
    from deeplocalproteindocking_tpu.structure.mmcif import (
        parse_structure)
    tag = "b" if bound else "u"
    rec = parse_structure(_find_structure(root, f"{code}_r_{tag}")).typed()
    lig = parse_structure(_find_structure(root, f"{code}_l_{tag}")).typed()
    return Complex(name=code, receptor=rec, ligand=lig)


def list_benchmark(root: str) -> List[str]:
    """Complex codes present in a benchmark directory."""
    codes = set()
    for fn in os.listdir(root):
        stem, ext = os.path.splitext(fn)
        if ext in _STRUCT_EXTS and (stem.endswith("_r_u")
                                    or stem.endswith("_r_b")):
            codes.add(fn.split("_")[0])
    return sorted(codes)


def split_benchmark(codes, fractions=(0.7, 0.15, 0.15), seed: int = 0):
    """Deterministic train/val/test split of complex codes (P6).

    Hash-stable: a code keeps its split when the benchmark grows.
    """
    import hashlib
    names = ("train", "val", "test")
    edges = np.cumsum(fractions) / float(np.sum(fractions))
    out = {n: [] for n in names}
    for code in sorted(codes):
        h = hashlib.sha256(f"{seed}:{code}".encode()).digest()
        u = int.from_bytes(h[:8], "big") / 2.0 ** 64
        out[names[int(np.searchsorted(edges, u, side="right"))]].append(code)
    return out


def structure_to_device(s: Structure, max_atoms: Optional[int] = None,
                        bucket: Optional[int] = None):
    """Pad to ``max_atoms`` and move to device arrays (coords, types, mask).

    ``bucket`` (used when ``max_atoms`` is None) rounds the atom count
    up to a multiple, so complexes of nearby sizes share one compiled
    sweep: exact-size padding made a 16-complex size-diverse benchmark
    retrace 15 distinct graphs (measured round 2); bucket=64 collapses
    that to ~4.  Padding is masked, so scores are unchanged.
    """
    s = s.typed()
    n = len(s)
    m = max_atoms or n
    if max_atoms is None and bucket:
        m = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    if n > m:
        raise ValueError(f"structure has {n} atoms > max_atoms={m}")
    coords = np.zeros((m, 3), dtype=np.float32)
    types = np.full((m,), -1, dtype=np.int32)
    mask = np.zeros((m,), dtype=np.float32)
    coords[:n] = s.coords
    types[:n] = s.types
    mask[:n] = 1.0
    return jnp.asarray(coords), jnp.asarray(types), jnp.asarray(mask)
