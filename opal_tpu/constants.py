"""Public constants of the opal_tpu engine.

These mirror the reference C API's integer constants so that callers of the
reference can switch without relearning the vocabulary
(reference: src/opal.h:16-40).
"""

# Error codes (reference: src/opal.h:17-19)
ERR_OVERFLOW = 1          # score cannot fit even in the widest precision
ERR_NO_SIMD_SUPPORT = 2   # kept for API parity; never raised on TPU
ERR_INVALID_MODE = 3

# Alignment modes (reference: src/opal.h:22-25)
MODE_NW = 0   # global (Needleman-Wunsch)
MODE_HW = 1   # semi-global: gaps at query start/end are free
MODE_OV = 2   # semi-global: gaps at starts/ends of both sequences are free
MODE_SW = 3   # local (Smith-Waterman)

MODE_NAMES = {MODE_NW: "NW", MODE_HW: "HW", MODE_OV: "OV", MODE_SW: "SW"}
MODE_CODES = {v: k for k, v in MODE_NAMES.items()}

# Overflow handling strategies (reference: src/opal.h:28-29)
OVERFLOW_SIMPLE = 0   # per-sequence escalation to the next precision
OVERFLOW_BUCKETS = 1  # whole bucket is escalated when any member overflows

# Search depths (reference: src/opal.h:32-34)
SEARCH_SCORE = 0       # score only (fastest)
SEARCH_SCORE_END = 1   # score + end location of the alignment
SEARCH_ALIGNMENT = 2   # score + start/end locations + operation string

# Alignment operations (reference: src/opal.h:37-40)
ALIGN_MATCH = 0
ALIGN_DEL = 1   # deletion from query (gap in target row rendering)
ALIGN_INS = 2   # insertion to query (gap in query row rendering)
ALIGN_MISMATCH = 3

# Default bucket size for OVERFLOW_BUCKETS (reference: src/opal.cpp:502,990)
BUCKET_SIZE = 1024
