"""ctypes binding to the C++ PDB parser (native/pdb_parser.cpp).

Loaded lazily by structure/pdb.py; when the shared library is absent an
import error propagates and the pure-Python parser takes over (identical
parsing rules — parity is asserted in tests/test_native.py).  The
library is built on demand with ``make -C native`` the first time, and
rebuilt automatically when it predates the current ABI (detected by a
missing ``pdb_parse_v2`` symbol).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpdbparse.so")


def _build(force: bool = False):
    cmd = ["make", "-C", _NATIVE_DIR] + (["-B"] if force else [])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        pass  # quiet failure -> OSError below when CDLL can't load


def _bind(lib):
    lib.pdb_count_atoms.restype = ctypes.c_int
    lib.pdb_count_atoms.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.pdb_parse_v2.restype = ctypes.c_int
    lib.pdb_parse_v2.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_char_p,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
    return lib


def _fresh_cdll():
    """CDLL the just-rebuilt library under a FRESH unique pathname.

    dlopen returns the cached handle for an already-loaded object, and
    glibc matches loaded objects by PATHNAME before it ever stats the
    file — so both re-CDLLing ``libpdbparse.so`` itself (round-4
    ADVICE) and re-CDLLing any fixed "tagged" alias (round-5 review)
    hand back the first, stale mapping on every later rebuild in the
    same process.  Each call therefore copies the rebuilt library to a
    path no dlopen has ever seen and unlinks it right after loading
    (the mapping survives the unlink on Linux), so repeat rebuilds
    always surface their new symbols and no stray .so accumulates.
    """
    import shutil
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=_NATIVE_DIR,
                               prefix="libpdbparse_loaded.",
                               suffix=".so")
    os.close(fd)
    try:
        shutil.copy2(_LIB_PATH, tmp)
        lib = ctypes.CDLL(tmp)
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return lib


def _load():
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)   # raises OSError if still missing
    if not hasattr(lib, "pdb_parse_v2"):
        _build(force=True)         # stale pre-v2 library: rebuild
        lib = _fresh_cdll()
    return _bind(lib)


_lib = _load()


def parse_pdb(path: str, include_hetatm: bool = False):
    """Parse with the C++ fast path -> Structure (or None on failure)."""
    from deeplocalproteindocking_tpu.structure.atom_types import (
        assign_atom_types)
    from deeplocalproteindocking_tpu.structure.pdb import (
        Structure, select_altlocs)

    het = 1 if include_hetatm else 0
    n = _lib.pdb_count_atoms(path.encode(), het)
    if n < 0:
        raise IOError(f"cannot read {path}")
    coords = np.zeros((n, 3), dtype=np.float32)
    atom_raw = ctypes.create_string_buffer(max(4 * n, 4))
    res_raw = ctypes.create_string_buffer(max(3 * n, 3))
    chain_raw = ctypes.create_string_buffer(max(n, 1))
    icode_raw = ctypes.create_string_buffer(max(n, 1))
    altloc_raw = ctypes.create_string_buffer(max(n, 1))
    res_ids = np.zeros(n, dtype=np.int32)
    occ = np.zeros(n, dtype=np.float32)
    got = _lib.pdb_parse_v2(
        path.encode(), het, n,
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        atom_raw, res_raw, chain_raw,
        res_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), icode_raw,
        altloc_raw, occ.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got != n:
        raise IOError(f"parse mismatch in {path}: {got} != {n}")
    atom_names = np.char.strip(
        np.frombuffer(atom_raw.raw[:4 * n], dtype="S4").astype("<U4"))
    res_names = np.char.strip(
        np.frombuffer(res_raw.raw[:3 * n], dtype="S3").astype("<U3"))
    chain_ids = np.frombuffer(
        chain_raw.raw[:n], dtype="S1").astype("<U1")
    icodes = np.char.strip(np.frombuffer(
        icode_raw.raw[:n], dtype="S1").astype("<U1"))
    altlocs = np.char.strip(np.frombuffer(
        altloc_raw.raw[:n], dtype="S1").astype("<U1"))
    keep = select_altlocs(atom_names, chain_ids, res_ids, icodes,
                          altlocs, occ)
    atom_names, res_names = atom_names[keep], res_names[keep]
    return Structure(
        coords=coords[keep],
        atom_names=atom_names,
        res_names=res_names,
        res_ids=res_ids[keep],
        chain_ids=chain_ids[keep],
        types=assign_atom_types(res_names, atom_names),
        icodes=icodes[keep],
    )
