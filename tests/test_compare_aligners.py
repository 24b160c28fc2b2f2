"""Cross-tool harness (tools/compare_aligners.py) end-to-end.

No competitor aligner (SSW / SSEARCH / SWIPE) is installable in this
environment (zero network egress, none vendored) — see BENCH_REPORT
"Cross-tool comparison". These tests keep the discovery + invocation +
output-parsing path from being dead code: fake competitor binaries
emitting each tool's documented timing format (the exact patterns the
reference protocol greps, reference: test/compare_aligners:28-39) are
planted via the SSW/SSEARCH/SWIPE env vars and must show up parsed in
the JSON rows.
"""
import json
import os
import stat
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _fake(tmp_path, name, script):
    p = tmp_path / name
    p.write_text("#!/bin/sh\n" + script)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


@pytest.fixture(scope="module")
def tiny_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmp")
    db = d / "db.fasta"
    db.write_text(">a\nMKVLAA\n>b\nDDEEKK\n>c\nMKVL\n")
    q = d / "QX.fasta"
    q.write_text(">QX test\nMKVLA\n")
    return d, str(db), str(q)


def test_fake_competitors_parsed(tiny_db, tmp_path, monkeypatch):
    d, db, q = tiny_db
    monkeypatch.setenv("SSW", _fake(
        tmp_path, "ssw_test", 'echo "0.177" >&2\n'))
    monkeypatch.setenv("SSEARCH", _fake(
        tmp_path, "ssearch36", 'echo "Total Scan time: 4.560"\n'))
    monkeypatch.setenv("SWIPE", _fake(
        tmp_path, "swipe", 'echo "Elapsed:  1.230"\n'))
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS")
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "compare_aligners.py"), db,
         "--queries", "QX", "--query-dir", str(d),
         "--swipe-db", db],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    rows = [json.loads(ln) for ln in r.stdout.splitlines()
            if ln.startswith("{")]
    assert len(rows) == 1
    row = rows[0]
    assert row["query"] == "QX"
    assert row["ssw"] == 0.177
    assert row["ssearch"] == 4.56
    assert row["swipe"] == 1.23
    # the opal_tpu lane really ran the CLI and parsed its timing line
    assert isinstance(row["opal_tpu"], float)


def test_unavailable_competitors_reported(tiny_db, monkeypatch):
    d, db, q = tiny_db
    for var in ("SSW", "SSEARCH", "SWIPE"):
        monkeypatch.delenv(var, raising=False)
    env = dict(os.environ, PATH="/usr/bin:/bin", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    for var in ("SSW", "SSEARCH", "SWIPE"):
        env.pop(var, None)
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "compare_aligners.py"), db,
         "--queries", "QX", "--query-dir", str(d)],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    row = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][0])
    assert row["ssw"] == "unavailable"
    assert row["ssearch"] == "unavailable"
    assert row["swipe"] == "unavailable"
