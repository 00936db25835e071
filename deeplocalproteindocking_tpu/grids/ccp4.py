"""CCP4/MRC binary density map export.

Companion to the XPLOR text writer (grids/xplor.py; reference analog
``Volume2Xplor`` [U: TorchProteinLibrary/Layers/Volume/Volume2Xplor —
mount empty, unverified]).  CCP4/MRC is the binary map format modern
viewers (ChimeraX, PyMOL, Coot) and EM tooling default to; 1024-byte
header + float32 section data, little-endian, MODE 2.

Host-side, debug/interchange only — never on the compute path.
"""
from __future__ import annotations

import struct

import numpy as np


def write_ccp4(path: str, volume, resolution: float = 1.25,
               origin: tuple = (0.0, 0.0, 0.0)) -> None:
    """Write a ``[L, L, L]`` volume as a CCP4/MRC (mode 2) map.

    Axis convention: volume[x, y, z] with columns=X fastest, rows=Y,
    sections=Z (MAPC/MAPR/MAPS = 1/2/3), cubic cell of
    ``L * resolution`` Angstrom.  ``origin`` is the Cartesian origin in
    Angstrom (ORIGIN header words, the convention MRC2014 viewers use).
    """
    vol = np.asarray(volume, dtype=np.float32)
    if vol.ndim != 3 or len(set(vol.shape)) != 1:
        raise ValueError(f"expected cubic [L,L,L] volume, got {vol.shape}")
    L = vol.shape[0]
    a = L * resolution
    # Data is written section-by-section: Z sections of [Y rows, X cols]
    # with X fastest -> transpose to [z, y, x] C-order.
    data = np.ascontiguousarray(vol.transpose(2, 1, 0))
    hdr = struct.pack(
        "<10i6f3i3f3i",
        L, L, L,                  # NC, NR, NS
        2,                        # MODE 2 = float32
        0, 0, 0,                  # NCSTART, NRSTART, NSSTART
        L, L, L,                  # MX, MY, MZ (sampling)
        a, a, a, 90.0, 90.0, 90.0,  # cell
        1, 2, 3,                  # MAPC, MAPR, MAPS (X, Y, Z)
        float(vol.min()), float(vol.max()), float(vol.mean()),
        1, 0, 0,                  # ISPG (P1), NSYMBT, LSKFLG
    )
    # words 26..49 extra (zeros), 50..52 ORIGIN, 53 MAP, 54 MACHST,
    # 55 RMS, 56 NLABL, 57.. labels
    extra = b"\x00" * (4 * 24)
    org = struct.pack("<3f", *map(float, origin))
    mapid = b"MAP "
    machst = struct.pack("<4B", 0x44, 0x44, 0x00, 0x00)  # little-endian
    rms = struct.pack("<f", float(vol.std()))
    label = b"deeplocalproteindocking_tpu".ljust(80)[:80]
    nlabl = struct.pack("<i", 1)
    labels = label + b"\x00" * (80 * 9)
    header = hdr + extra + org + mapid + machst + rms + nlabl + labels
    assert len(header) == 1024, len(header)
    with open(path, "wb") as f:
        f.write(header)
        f.write(data.tobytes())


def read_ccp4(path: str):
    """Read back a mode-2 CCP4 map (round-trip testing / ingestion).

    Returns ``(volume [L, L, L] float32, resolution)`` assuming the
    cubic single-axis convention of :func:`write_ccp4`.
    """
    with open(path, "rb") as f:
        header = f.read(1024)
        nc, nr, ns, mode = struct.unpack("<4i", header[:16])
        if mode != 2:
            raise ValueError(f"unsupported CCP4 mode {mode}")
        mx = struct.unpack("<i", header[28:32])[0]
        xlen = struct.unpack("<f", header[40:44])[0]
        data = np.frombuffer(f.read(4 * nc * nr * ns),
                             dtype="<f4").reshape(ns, nr, nc)
    return (np.ascontiguousarray(data.transpose(2, 1, 0)),
            xlen / mx)
