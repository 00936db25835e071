"""ctypes binding to the C++ CIF tokenizer (native/cif_tokenizer.cpp).

Loaded lazily by structure/mmcif.py; when the shared library is absent
(or the text is not encodable) the pure-Python tokenizer takes over —
identical token stream, parity asserted in tests/test_native.py.  The
library is shared with the PDB parser (native/libpdbparse.so), built on
demand and rebuilt when it predates this ABI (missing
``cif_tokenize_v1`` symbol).
"""
from __future__ import annotations

import ctypes

from deeplocalproteindocking_tpu.native.pdb_native import (
    _build, _fresh_cdll, _LIB_PATH)


def _bind_tokenizer(lib):
    lib.cif_tokenize_v1.restype = ctypes.c_void_p
    lib.cif_tokenize_v1.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_long)]
    lib.cif_token_buffer.restype = ctypes.POINTER(ctypes.c_char)
    lib.cif_token_buffer.argtypes = [ctypes.c_void_p]
    lib.cif_token_offsets.restype = ctypes.POINTER(ctypes.c_int64)
    lib.cif_token_offsets.argtypes = [ctypes.c_void_p]
    lib.cif_token_flags.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.cif_token_flags.argtypes = [ctypes.c_void_p]
    lib.cif_free.restype = None
    lib.cif_free.argtypes = [ctypes.c_void_p]
    return lib


def _load():
    import os
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    if not hasattr(lib, "cif_tokenize_v1"):
        # Pre-CIF library already dlopen'd somewhere in this process:
        # rebuild, then load under a fresh unique pathname (re-CDLLing
        # any previously-seen path returns the cached stale handle —
        # round-4 ADVICE + round-5 review).
        _build(force=True)
        lib = _fresh_cdll()
    return _bind_tokenizer(lib)


_lib = _load()


def tokenize_cif(text: str):
    """``[(is_value_literal, token), ...]`` — same stream as the
    pure-Python ``structure.mmcif._tokenize_cif_py``."""
    raw = text.encode("utf-8", "surrogateescape")
    n = ctypes.c_long(0)
    h = _lib.cif_tokenize_v1(raw, len(raw), ctypes.byref(n))
    if not h:
        raise MemoryError("cif_tokenize_v1 failed")
    try:
        nt = n.value
        offs = _lib.cif_token_offsets(h)
        flags = _lib.cif_token_flags(h)
        buf = ctypes.string_at(_lib.cif_token_buffer(h),
                               offs[nt] if nt else 0)
        out = []
        for i in range(nt):
            s = buf[offs[i]:offs[i + 1]].decode("utf-8",
                                                "surrogateescape")
            out.append((bool(flags[i]), s))
        return out
    finally:
        _lib.cif_free(h)


def _bind_atom_site(lib):
    lib.cif_atom_site_v1.restype = ctypes.c_void_p
    lib.cif_atom_site_v1.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
    for g, t in [("cif_as_xyz", ctypes.POINTER(ctypes.c_float)),
                 ("cif_as_occ", ctypes.POINTER(ctypes.c_float)),
                 ("cif_as_rid", ctypes.POINTER(ctypes.c_int32)),
                 ("cif_as_names", ctypes.POINTER(ctypes.c_char)),
                 ("cif_as_res", ctypes.POINTER(ctypes.c_char)),
                 ("cif_as_chain", ctypes.POINTER(ctypes.c_char)),
                 ("cif_as_icode", ctypes.POINTER(ctypes.c_char)),
                 ("cif_as_alt", ctypes.POINTER(ctypes.c_char))]:
        getattr(lib, g).restype = t
        getattr(lib, g).argtypes = [ctypes.c_void_p]
    lib.cif_as_free.restype = None
    lib.cif_as_free.argtypes = [ctypes.c_void_p]


if not hasattr(_lib, "cif_atom_site_v1"):
    _build(force=True)
    _lib = _bind_tokenizer(_fresh_cdll())
    if not hasattr(_lib, "cif_atom_site_v1"):
        raise ImportError("rebuilt libpdbparse.so still lacks "
                          "cif_atom_site_v1")
_bind_atom_site(_lib)


def parse_atom_site(text: str, include_hetatm: bool = False,
                    model: int = 1):
    """``_atom_site`` table as packed numpy arrays, entirely in C++.

    Returns ``(coords, names, res, chain, rid, icode, alt, occ,
    model_count)`` with the same row-filter semantics as
    ``structure.mmcif.parse_mmcif_text`` (ATOM/HETATM, Nth-distinct
    model, auth->label fallbacks, './?' as missing).  Fixed-width
    fields are space-padded (names 8, res 4, chain/icode/alt 2).
    """
    import numpy as np
    raw = text.encode("utf-8", "surrogateescape")
    n = ctypes.c_long(0)
    mc = ctypes.c_long(0)
    h = _lib.cif_atom_site_v1(raw, len(raw),
                              1 if include_hetatm else 0, model,
                              ctypes.byref(n), ctypes.byref(mc))
    if not h:
        raise MemoryError("cif_atom_site_v1 failed")
    try:
        k = n.value

        def chars(getter, w, u):
            b = ctypes.string_at(getter(h), w * k) if k else b""
            return np.char.strip(
                np.frombuffer(b, dtype=f"S{w}").astype(f"<U{u}"))

        if k == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros(0, "<U8"), np.zeros(0, "<U4"),
                    np.zeros(0, "<U2"), np.zeros(0, np.int32),
                    np.zeros(0, "<U2"), np.zeros(0, "<U2"),
                    np.zeros(0, np.float32), mc.value)
        coords = np.ctypeslib.as_array(
            _lib.cif_as_xyz(h), shape=(k, 3)).astype(np.float32,
                                                     copy=True)
        occ = np.ctypeslib.as_array(
            _lib.cif_as_occ(h), shape=(k,)).astype(np.float32,
                                                   copy=True)
        rid = np.ctypeslib.as_array(
            _lib.cif_as_rid(h), shape=(k,)).astype(np.int32, copy=True)
        names = chars(_lib.cif_as_names, 8, 8)
        res = chars(_lib.cif_as_res, 4, 4)
        chain = chars(_lib.cif_as_chain, 2, 2)
        icode = chars(_lib.cif_as_icode, 2, 2)
        alt = chars(_lib.cif_as_alt, 2, 2)
        return (coords, names, res, chain, rid, icode, alt, occ,
                mc.value)
    finally:
        _lib.cif_as_free(h)
