"""Search result model.

Mirrors the information content of the reference's ``OpalSearchResult``
(reference: src/opal.h:47-74) with Pythonic field names. Alignment is a
numpy uint8 array of ALIGN_* operation codes, or ``None``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(slots=True)
class SearchResult:
    score_set: int = 0
    score: int = 0
    # 0-indexed end positions of the alignment; -1 if not set.
    end_location_target: int = -1
    end_location_query: int = -1
    # 0-indexed start positions of the alignment; -1 if not set.
    start_location_target: int = -1
    start_location_query: int = -1
    # Sequence of ALIGN_* op codes (uint8 ndarray), or None.
    alignment: Optional[np.ndarray] = None
    alignment_length: int = 0

    def is_empty(self) -> bool:
        """Reference: opalSearchResultIsEmpty (src/opal.cpp:1557-1559)."""
        return not self.score_set

    def set_score(self, score: int) -> None:
        """Reference: opalSearchResultSetScore (src/opal.cpp:1561-1564)."""
        self.score_set = 1
        self.score = int(score)

    def reset(self) -> None:
        """Reference: opalInitSearchResult (src/opal.cpp:1549-1555)."""
        self.score_set = 0
        self.score = 0
        self.start_location_target = self.start_location_query = -1
        self.end_location_target = self.end_location_query = -1
        self.alignment = None
        self.alignment_length = 0


def init_results(n: int) -> list[SearchResult]:
    return [SearchResult() for _ in range(n)]
