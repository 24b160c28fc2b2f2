"""FASTA input.

Streaming, memory-bounded FASTA reading with the same observable semantics as
the reference CLI's reader (reference: src/opal_aligner.cpp:240-301):

- Sequences are returned as numpy uint8 arrays of alphabet *indices*, mapped
  through a 128-entry LUT where '*' (if present in the alphabet) absorbs every
  character not otherwise in the alphabet.
- Header lines ('>' ...) are skipped; '\r' and '\n' never contribute residues;
  a sequence may span multiple lines; empty lines do not terminate a sequence.
- Reading stops (returning eof=False) once more than ``max_residues`` residues
  of *completed* sequences have been accumulated and a new sequence is about
  to start; the file position is rewound to the start of that new sequence so
  a subsequent call resumes there (reference: src/opal_aligner.cpp:282-289).
"""
from __future__ import annotations

from typing import BinaryIO

import numpy as np

DEFAULT_MAX_RESIDUES = 1073741824  # 1 GiB, reference: src/opal_aligner.cpp:286


class PushbackReader:
    """Binary line reader with one-line pushback.

    The chunked reader's only "rewind" is un-reading the line that
    overflowed the residue budget. On a GzipFile a backward seek
    re-decompresses from the START of the file, making a multi-chunk
    gzipped scan O(n_chunks^2); buffering the line on the Python side
    makes every input O(n) and also drops the per-line tell() overhead."""

    def __init__(self, f: BinaryIO):
        self._f = f
        self._pending: bytes | None = None

    def readline(self) -> bytes:
        if self._pending is not None:
            line, self._pending = self._pending, None
            return line
        return self._f.readline()

    def unread(self, line: bytes) -> None:
        assert self._pending is None
        self._pending = line

    def read(self, *a):
        assert self._pending is None
        return self._f.read(*a)

    def close(self):
        return self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return self._f.__exit__(*exc)


def read_fasta_sequences(
    f: BinaryIO,
    letter_idx: np.ndarray,
    max_residues: int = DEFAULT_MAX_RESIDUES,
    return_names: bool = False,
):
    """Read (a chunk of) a FASTA file opened in binary mode.

    letter_idx: 128-entry uint8 LUT (see ScoreMatrix.letter_index()); entries
        of 255 mean "invalid letter" and raise ValueError.
    Returns (seqs, eof) or (seqs, names, eof) when return_names is True.
    """
    lut = np.asarray(letter_idx, dtype=np.uint8)
    seqs: list[np.ndarray] = []
    names: list[str] = []
    parts: list[bytes] = []  # raw residue byte-chunks of the current sequence
    in_sequence = False
    completed_residues = 0
    pending_name = ""
    cur_name = ""
    eof = True

    def flush_current():
        nonlocal parts, completed_residues
        raw = b"".join(parts)
        parts = []
        arr = lut[np.frombuffer(raw, dtype=np.uint8) & 0x7F]
        # Reject bytes >= 128 or letters with no mapping.
        if (np.frombuffer(raw, dtype=np.uint8) > 127).any() or (arr == 255).any():
            raise ValueError("sequence contains letters outside the alphabet")
        seqs.append(arr)
        names.append(cur_name)
        completed_residues += arr.size

    can_unread = hasattr(f, "unread")
    while True:
        line_start = None if can_unread else f.tell()
        line = f.readline()
        if not line:
            break
        if line.startswith(b">"):
            if in_sequence:
                flush_current()
            in_sequence = False
            pending_name = line[1:].strip().decode("utf-8", "replace")
            continue
        stripped = line.rstrip(b"\r\n").replace(b"\r", b"")
        if not stripped:
            continue
        if not in_sequence:
            # About to start a new sequence: enforce the residue budget.
            if completed_residues > max_residues:
                # Un-read (or seek back to) the overflowing line so a
                # subsequent call resumes there. unread is O(1) on any
                # stream; the seek fallback is O(file) on gzip.
                if can_unread:
                    f.unread(line)
                else:
                    f.seek(line_start)
                eof = False
                # The header of the rewound sequence was consumed; rewinding to
                # the residue line matches the reference, which also re-enters
                # mid-record (it rewinds to the first residue character).
                break
            in_sequence = True
            cur_name = pending_name
        parts.append(stripped)

    if in_sequence:
        flush_current()
    if return_names:
        return seqs, names, eof
    return seqs, eof


def open_fasta(path: str):
    """Open a FASTA file for binary reading, transparently decompressing
    gzip (sniffed by magic bytes, so any extension works). Real-world
    sequence databases ship gzipped; the reference reader does not
    support this."""
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        import gzip

        return PushbackReader(gzip.open(path, "rb"))
    return PushbackReader(open(path, "rb"))


def read_fasta_file(path: str, letter_idx: np.ndarray, return_names: bool = False):
    """Read an entire FASTA file (no residue budget); gzip transparent.

    Uses the native C tokenizer (opal_tpu/_native) when available — the
    TPU-native equivalent of the reference's C++ reader — and falls back to
    the pure-Python streaming reader otherwise."""
    if not return_names:
        try:
            from ._native import parse_fasta_buffer

            with open_fasta(path) as f:
                buf = f.read()
            seqs = parse_fasta_buffer(buf, letter_idx)
            if seqs is not None:
                return seqs, True
        except ValueError:
            raise
        except Exception:
            pass
    with open_fasta(path) as f:
        return read_fasta_sequences(
            f, letter_idx, max_residues=2**62, return_names=return_names
        )
