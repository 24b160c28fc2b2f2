"""Test configuration. Two lanes:

- Default: JAX pinned to CPU with 8 virtual devices so sharding logic is
  exercised without TPU hardware (SURVEY.md §4); `tpu`-marked tests skip.
- Hardware lane: `OPAL_TPU_HW_TESTS=1 pytest -m tpu` leaves the platform
  alone (the axon plugin exposes the real chip) and runs the `tpu`-marked
  suite on hardware — the CI-style validation BENCH_REPORT cites.
"""
import os
import sys

HW_LANE = os.environ.get("OPAL_TPU_HW_TESTS") == "1"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
if not HW_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not HW_LANE:
    # The environment may force a remote TPU platform programmatically (an
    # axon sitecustomize overriding JAX_PLATFORMS); pin unit tests to CPU.
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_DATA = "/root/reference/test_data"


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line(
        "markers",
        "timeout(seconds): wall budget; enforced by pytest-timeout when "
        "installed (the marked tests also bound their own subprocesses)")


def _probe_tpu(timeout_s: int = 150) -> bool:
    """Bounded device-discovery probe (subprocess): on the tunneled axon
    platform jax.devices() hangs indefinitely during tunnel outages (see
    CLAUDE.md gotchas), which would wedge collection; a dead tunnel must
    skip the tpu lane with a reason instead."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and r.stdout.strip().splitlines()[-1] != "cpu"
    except subprocess.TimeoutExpired:
        return False


def pytest_collection_modifyitems(config, items):
    on_tpu = HW_LANE and _probe_tpu()
    skip_tpu = pytest.mark.skip(
        reason="needs OPAL_TPU_HW_TESTS=1 and a reachable TPU "
        "(device probe failed or timed out)")
    skip_cpu = pytest.mark.skip(
        reason="CPU-lane test (hardware lane runs only -m tpu)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
        elif HW_LANE and "tpu" not in item.keywords:
            # the hardware lane must not run the CPU suite against the
            # remote chip (virtual mesh assumptions don't hold there)
            item.add_marker(skip_cpu)


@pytest.fixture(scope="session")
def blosum50():
    from opal_tpu.matrices import ScoreMatrix

    return ScoreMatrix.blosum50()


@pytest.fixture(scope="session")
def sprot15(blosum50):
    from opal_tpu.fasta import read_fasta_file

    lut = blosum50.letter_index()
    db, _ = read_fasta_file(f"{REF_DATA}/db/uniprot_sprot15.fasta", lut)
    return db


@pytest.fixture(scope="session")
def query_O74807(blosum50):
    from opal_tpu.fasta import read_fasta_file

    lut = blosum50.letter_index()
    qs, _ = read_fasta_file(f"{REF_DATA}/query/O74807.fasta", lut)
    return qs[0]
