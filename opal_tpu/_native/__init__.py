"""Native (C) components, loaded via ctypes with transparent compilation.

The reference's data loader is C++ (src/opal_aligner.cpp:240-301); parsing
hundreds of MB of FASTA in pure Python would dominate end-to-end CLI time, so
the tokenizer is a small C library compiled once into the user cache and
loaded with ctypes. Everything degrades gracefully to the pure-Python
implementation when no C compiler is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fasta_parse.c")

_lib = None
_tried = False


def _build_and_load():
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "OPAL_TPU_NATIVE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "opal_tpu"),
    )
    so_path = os.path.join(cache_dir, f"fasta_parse_{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache_dir, exist_ok=True)
        tmp = so_path + f".tmp{os.getpid()}"
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so_path)
                break
            except (OSError, subprocess.CalledProcessError):
                continue
        else:
            return None
    lib = ctypes.CDLL(so_path)
    fn = lib.opal_fasta_parse
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    return fn


def fasta_parser():
    """The native parse function or None if unavailable."""
    global _lib, _tried
    if not _tried:
        _tried = True
        if not os.environ.get("OPAL_TPU_NO_NATIVE"):
            try:
                _lib = _build_and_load()
            except Exception:
                _lib = None
    return _lib


def parse_fasta_buffer(buf: bytes, lut):
    """Parse an in-memory FASTA buffer with the native tokenizer.

    Returns list of np.uint8 index arrays, or None if native is unavailable.
    Raises ValueError on invalid residue bytes."""
    import numpy as np

    fn = fasta_parser()
    if fn is None:
        return None
    n = len(buf)
    max_seqs = buf.count(b">") + 1
    out_res = np.empty(n, dtype=np.uint8)
    out_starts = np.empty(max_seqs, dtype=np.int64)
    out_lens = np.empty(max_seqs, dtype=np.int64)
    lut = np.ascontiguousarray(lut, dtype=np.uint8)
    rc = fn(
        buf, n, lut.ctypes.data,
        out_res.ctypes.data, out_starts.ctypes.data, out_lens.ctypes.data,
    )
    if rc < 0:
        pos = -(rc + 1)
        raise ValueError(
            f"invalid residue byte {buf[pos]!r} at offset {pos}"
        )
    return [
        out_res[out_starts[i] : out_starts[i] + out_lens[i]].copy()
        for i in range(rc)
    ]
