"""opal_tpu: TPU-native massive optimal sequence alignment.

A from-scratch JAX/XLA/Pallas engine with the capabilities of the reference
Opal library (github.com/Martinsos/opal): optimal pairwise alignment of a
query against large sequence databases in four modes (SW/NW/HW/OV, affine
gaps), three search depths (score / +end location / full alignment path),
loadable score matrices, an opal_aligner-compatible CLI, and database
sharding across TPU device meshes.
"""
import os as _os

# Persistent compilation cache: kernel shapes depend on padded block lengths,
# so caching compiled executables across processes matters for CLI latency.
if not _os.environ.get("OPAL_TPU_NO_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "opal_tpu_jax"),
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    # A sitecustomize (e.g. a PJRT plugin registration) may have imported
    # jax BEFORE this package set the env vars — jax snapshots them into
    # its config at import, leaving the persistent cache silently
    # uninitialized (TPU kernels then recompile in every process, tens of
    # seconds each). If jax is already in, apply the settings directly.
    import sys as _sys

    if "jax" in _sys.modules:
        try:
            _jc = _sys.modules["jax"].config
            if getattr(_jc, "jax_compilation_cache_dir", None) is None:
                _jc.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])
                _jc.update(
                    "jax_persistent_cache_min_compile_time_secs",
                    float(_os.environ[
                        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
                )
        except Exception:  # never let cache plumbing break imports
            pass

from .constants import (  # noqa: F401,E402
    ALIGN_DEL,
    ALIGN_INS,
    ALIGN_MATCH,
    ALIGN_MISMATCH,
    MODE_HW,
    MODE_NW,
    MODE_OV,
    MODE_SW,
    OVERFLOW_BUCKETS,
    OVERFLOW_SIMPLE,
    SEARCH_ALIGNMENT,
    SEARCH_SCORE,
    SEARCH_SCORE_END,
)
from .matrices import ScoreMatrix  # noqa: F401,E402
from .result import SearchResult, init_results  # noqa: F401,E402

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports so `import opal_tpu` stays cheap (no jax import).
    if name in ("search_database", "search_database_arrays",
                "search_database_multi_arrays", "Engine", "EngineConfig"):
        from .engine import search as _s

        return getattr(_s, name)
    if name == "search_database_char_sw":
        from .engine import cascade as _c

        return _c.search_database_char_sw
    raise AttributeError(name)
