"""Substitution (score) matrices.

Functional equivalent of the reference's ``ScoreMatrix`` class
(reference: src/ScoreMatrix.{hpp,cpp}): an alphabet plus a row-major
``alphabet_len x alphabet_len`` integer matrix, a loader for the plain-text
matrix file format (first line = whitespace-separated alphabet letters,
remaining lines = matrix rows), and built-in standard matrices.

The reference's built-in is BLOSUM50 (src/ScoreMatrix.cpp:57-85); here all six
matrices it ships as files are available as builtins by name.
"""
from __future__ import annotations

import numpy as np

from .data.matrices_builtin import BUILTIN


class ScoreMatrix:
    def __init__(self, alphabet, matrix):
        """alphabet: str or sequence of single chars; matrix: flat row-major
        list/array of len(alphabet)**2 ints."""
        self.alphabet = "".join(alphabet)
        n = len(self.alphabet)
        m = np.asarray(matrix, dtype=np.int32).reshape(n, n)
        self.matrix = m

    @property
    def alphabet_length(self) -> int:
        return len(self.alphabet)

    @property
    def flat(self) -> np.ndarray:
        return self.matrix.reshape(-1)

    @property
    def max_score(self) -> int:
        """Max value in the matrix; used by the traceback band formulas
        (reference: arrayMax, src/opal.cpp:1029-1038)."""
        return int(self.matrix.max())

    @classmethod
    def from_file(cls, filepath: str) -> "ScoreMatrix":
        """Parse the reference's matrix file format
        (reference: src/ScoreMatrix.cpp:17-35): first line holds the alphabet
        letters separated by whitespace, remaining lines hold matrix rows."""
        with open(filepath) as f:
            lines = [ln for ln in f.read().splitlines()]
        alphabet = [tok[0] for tok in lines[0].split()]
        scores: list[int] = []
        for ln in lines[1:]:
            scores.extend(int(tok) for tok in ln.split())
        n = len(alphabet)
        if len(scores) != n * n:
            raise ValueError(
                f"matrix file {filepath!r}: expected {n*n} scores, got {len(scores)}"
            )
        return cls(alphabet, scores)

    @classmethod
    def from_name(cls, name: str) -> "ScoreMatrix":
        """Built-in matrix by case-insensitive name, e.g. 'Blosum50'."""
        key = name.lower()
        if key not in BUILTIN:
            raise KeyError(
                f"unknown score matrix {name!r}; available: {sorted(BUILTIN)}"
            )
        alphabet, flat = BUILTIN[key]
        return cls(alphabet, flat)

    @classmethod
    def blosum50(cls) -> "ScoreMatrix":
        """The reference's default built-in (src/ScoreMatrix.cpp:57-85)."""
        return cls.from_name("blosum50")

    def letter_index(self) -> np.ndarray:
        """128-entry ASCII->alphabet-index LUT. If '*' is in the alphabet, it
        absorbs every character not otherwise present
        (reference: readFastaSequences, src/opal_aligner.cpp:250-258).
        Characters with no mapping get 255 (caller decides how to fail)."""
        lut = np.full(128, 255, dtype=np.uint8)
        star = self.alphabet.find("*")
        if star >= 0:
            lut[:] = star
        for i, ch in enumerate(self.alphabet):
            lut[ord(ch)] = i
        return lut

    def encode(self, text: str) -> np.ndarray:
        """Encode a letter string to alphabet indices via letter_index()."""
        lut = self.letter_index()
        arr = lut[np.frombuffer(text.encode("ascii"), dtype=np.uint8)]
        if (arr == 255).any():
            bad = text[int(np.argmax(arr == 255))]
            raise ValueError(f"letter {bad!r} not in alphabet and no '*' catch-all")
        return arr
