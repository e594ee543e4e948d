"""CLI end-to-end tests via subprocess — mirrors the reference's
spawn-the-binary test layer (ref tests/integration.rs:668-1047:
dry-run counts, append flow, idempotence skip, quiet mode, formats).

Each invocation pays a full Spark session startup, so assertions are
batched into few subprocesses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str, expect: int = 0) -> subprocess.CompletedProcess:
    env = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "4"}
    proc = subprocess.run(
        [sys.executable, "-m", "shaha_spark", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert proc.returncode == expect, (args, proc.returncode, proc.stderr[-800:])
    return proc


def test_algorithms_fast_path():
    out = run_cli("algorithms").stdout.split()
    assert out == [
        "md5", "sha1", "sha256", "sha512", "keccak256",
        "ripemd160", "blake3", "hash160", "hash256",
    ]


@pytest.fixture(scope="module")
def wordlist(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    w = d / "words.txt"
    w.write_text("password\npassword\nhello\n\nworld\n")
    return d, str(w)


def test_build_dry_run_counts(wordlist):
    d, w = wordlist
    # ref integration.rs:668-707: 3 unique from 4 non-empty lines (1 dup)
    proc = run_cli("build", w, "-a", "sha256,md5", "-o", str(d / "unused"), "--dry-run")
    summary = json.loads(proc.stderr[proc.stderr.index("{"):])
    assert summary == {
        "dry_run": True, "total_words": 4, "unique_words": 3,
        "duplicates": 1, "records_to_generate": 6,
    }


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_build_query_info_append_idempotence(wordlist):
    d, w = wordlist
    db = str(d / "db")
    run_cli("build", w, "-a", "sha256", "-o", db, "--quiet")

    # query hit, all three formats, in one process chain per format
    import hashlib

    digest = hashlib.sha256(b"password").hexdigest()
    plain = run_cli("query", digest, "-d", db).stdout
    assert "password" in plain and digest in plain
    table = run_cli("query", digest, "-d", db, "--format", "table").stdout
    assert "│ password │" in table and "Preimage" in table
    jout = json.loads(run_cli("query", digest, "-d", db, "--format", "json").stdout)
    assert jout[0]["preimage"] == "password"

    # miss exits 1 with message (ref query.rs:82)
    miss = run_cli("query", "00" * 32, "-d", db, expect=1)
    assert "No matches found" in miss.stderr

    # append second list merges; idempotent re-add skips
    w2 = d / "more.txt"
    w2.write_text("hello\nhunter2\n")
    proc = run_cli("build", str(w2), "-a", "sha256", "-o", db, "--append")
    summary = json.loads(proc.stderr[proc.stderr.index("{"):])
    assert summary["total_records"] == 4
    proc = run_cli("build", str(w2), "-a", "sha256", "-o", db, "--append")
    summary = json.loads(proc.stderr[proc.stderr.index("{"):])
    assert summary["skipped"] is True  # ref integration.rs:752-793

    info = run_cli("info", "-d", db, "--format", "json").stdout
    meta = json.loads(info)
    assert meta["total_records"] == 4
    assert meta["sources"] == ["more.txt", "words.txt"]


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_query_output_is_bounded_on_large_db(tmp_path):
    """json/table formats cap an unlimited query at DEFAULT_QUERY_LIMIT
    (the DB here is larger than the cap); plain streams every row
    without a driver-side collect. Guards cli.py against the unbounded
    `collect()` a short prefix would trigger on a 100 TB database."""
    from shaha_spark.query import DEFAULT_QUERY_LIMIT

    n_words = DEFAULT_QUERY_LIMIT + 100
    w = tmp_path / "many.txt"
    w.write_text("".join(f"word-{i:05d}\n" for i in range(n_words)))
    db = str(tmp_path / "bigdb")
    run_cli("build", str(w), "-a", "sha256", "-o", db, "--quiet")

    # empty prefix matches everything — json output must stop at the cap
    proc = run_cli("query", "", "-d", db, "--format", "json")
    rows = json.loads(proc.stdout)
    assert len(rows) == DEFAULT_QUERY_LIMIT
    assert f"first {DEFAULT_QUERY_LIMIT}" in proc.stderr

    # explicit -n still wins
    jout = json.loads(run_cli("query", "", "-d", db, "--format", "json", "-n", "7").stdout)
    assert len(jout) == 7

    # plain format streams the full result set
    plain = run_cli("query", "", "-d", db).stdout
    assert len(plain.strip().splitlines()) == n_words


def test_query_out_writes_distributed(spark, tmp_path):
    import hashlib
    import subprocess
    import sys

    from shaha_spark.pipeline.build import build

    wdf = spark.createDataFrame([(f"w{i}",) for i in range(50)], "word string")
    db = str(tmp_path / "outdb")
    build(spark, wdf, ["sha256"], db)
    prefix = hashlib.sha256(b"w7").hexdigest()[:2]
    out_csv = str(tmp_path / "matches.csv")
    proc = subprocess.run(
        [sys.executable, "-m", "shaha_spark", "query", prefix, "-d", db,
         "--out", out_csv],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    back = spark.read.option("header", "true").csv(out_csv)
    got = {r["preimage"] for r in back.collect()}
    expected = {
        f"w{i}" for i in range(50)
        if hashlib.sha256(f"w{i}".encode()).hexdigest().startswith(prefix)
    }
    assert got == expected and "w7" in got


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_sql_verb_live_and_time_travel(tmp_path):
    """sql verb: ad-hoc SQL over the db view, json/tsv rendering, and
    --at-version pinning — one subprocess per spark-session-paying
    step, assertions batched."""
    w1 = tmp_path / "w1.txt"
    w1.write_text("alpha\nbeta\n")
    db = str(tmp_path / "db")
    run_cli("build", f"file:{w1}", "-a", "sha256", "-o", db)
    run_cli("snapshot", "create", "-d", db)
    w2 = tmp_path / "w2.txt"
    w2.write_text("gamma\n")
    run_cli("build", f"file:{w2}", "-a", "sha256", "-o", db, "--append")

    live = run_cli(
        "sql", "SELECT count(*) AS n FROM db", "-d", db, "--format", "json"
    )
    assert json.loads(live.stdout) == [{"n": 3}]
    old = run_cli(
        "sql",
        "SELECT preimage FROM db ORDER BY preimage",
        "-d", db, "--at-version", "1", "--format", "json",
    )
    assert [r["preimage"] for r in json.loads(old.stdout)] == ["alpha", "beta"]
    tsv = run_cli(
        "sql", "SELECT algorithm, count(*) AS n FROM db GROUP BY 1", "-d", db
    )
    assert tsv.stdout.splitlines() == ["algorithm\tn", "sha256\t3"]
    run_cli("sql", "SELECT nope FROM db", "-d", db, expect=2)


def test_source_dispatch_messages():
    """Known provider + unsupported subcommand must not claim the
    provider is unknown; truly unknown providers exit 2."""
    proc = run_cli("source", "path", "aspell", expect=2)
    assert "Unknown provider" not in proc.stderr
    assert "not supported" in proc.stderr
    proc = run_cli("source", "path", "nosuch", expect=2)
    assert "Unknown provider" in proc.stderr


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_cli_error_contract_batch(tmp_path):
    """One subprocess-paying batch over a tiny db: unknown query
    algorithm exits 2 with a clean message (not silent no-match),
    query --out with zero matches exits 1, sql --format json renders
    timestamps/decimals, snapshot read of a nonexistent version exits
    2 cleanly, forget with a bad -a exits 2 cleanly."""
    w = tmp_path / "w.txt"
    w.write_text("alpha\nbeta\n")
    db = str(tmp_path / "db")
    run_cli("build", str(w), "-a", "sha256", "-o", db, "--quiet")

    proc = run_cli("query", "ab", "-d", db, "-a", "SHA256", expect=2)
    assert "unknown algorithm" in proc.stderr and "sha256" in proc.stderr

    out = str(tmp_path / "none.csv")
    import hashlib as _h
    absent = _h.sha256(b"not-in-db").hexdigest()
    proc = run_cli("query", absent, "-d", db, "--out", out, expect=1)
    assert "No matches found" in proc.stderr

    proc = run_cli(
        "sql",
        "SELECT current_timestamp() AS t, CAST(1.5 AS DECIMAL(10,2)) AS d",
        "-d", db, "--format", "json",
    )
    row = json.loads(proc.stdout)[0]
    assert "t" in row and row["d"] in ("1.50", "1.5")

    proc = run_cli("snapshot", "read", "-d", db, "-v", "99", expect=2)
    assert proc.stderr.startswith("error:") or "error:" in proc.stderr
    assert "Traceback" not in proc.stderr

    proc = run_cli("forget", "-d", db, "-w", "alpha", "-a", "sha-256",
                   "--dry-run", expect=2)
    assert "unknown algorithm" in proc.stderr
    assert "Traceback" not in proc.stderr
