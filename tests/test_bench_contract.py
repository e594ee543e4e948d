"""Bench output contract: the three capture-critical tail lines must
survive the driver's 2000-char stdout tail capture at MAX key
population (VERDICT r12 item 9 — the runtime warning already guards a
live run; this pins the budget at authoring time so adding a gate key
or a bench query that would clip the capture fails CI, not the round).

No SparkSession needed: bench.render_tail_lines is pure formatting.
"""

from __future__ import annotations

import json

import bench

# Every query currently on the bench (adding entries is allowed by the
# driver contract — removing/renaming is not; test_bench_queries below
# fails if one disappears so the contract can't erode silently).
BENCH_QUERIES = [
    "build_hashdb", "query_point", "query_prefix", "query_full_scan",
    "tpch_q1", "tpch_q3", "tpch_q5", "events_salted_agg",
    "events_sessionize", "dedup_minhash_pairs", "dedup_simhash",
    "similarity_topk", "text_quality", "dedup_exact",
]

# Max plausible value widths, from 13 rounds of history: no query
# median has exceeded 5.3 s and r2's worst-case machine contention
# DOUBLED timings rather than 10x'ing them, so single-digit seconds
# (double-digit for the build) bound a degraded run; kernel rates are
# < 10M words/s; rep-end loadavg has never reached double digits.
# Values beyond this envelope would clip — the runtime warning in
# bench.py still covers that unreachable case.
_WORST_GATES = {
    "blake3_words_per_sec_best3": 8888888.9,
    "keccak_words_per_sec_best3": 8888888.9,
    "stream_build_words_per_sec": 888888.9,
    "build_words_per_sec": 888888.9,
    "db_bytes_per_record": 888.88,
    "ivf_recall_gate": "pass recall=0.88",
    "pq_clus_gate": "pass nprobe=16/16",
    "sf4_pq_clus_gate": "pass nprobe=16/16 at 40x",
    "sf4_pq_clus_topk_ratio": 888.88,
    "ivfpq_append_corpus_rows": 88888888,
    "ivfpq_append_batch_rows": 8888888,
    "ivfpq_append_vs_rebuild": 8888.88,
    "sf1_build_hashdb_ratio": 88.88,
}


def _render_worst_case(n_reps: int = 3):
    def sec(q):
        return 88.889 if q == "build_hashdb" else 8.889

    timings = {q: sec(q) for q in BENCH_QUERIES}
    warm = {q: sec(q) for q in BENCH_QUERIES}
    samples = {
        q: [[round(sec(q), 2), 8.8]] * n_reps for q in BENCH_QUERIES
    }
    extras = {"loadavg_start": 8.88, "loadavg_end": 8.88, **_WORST_GATES}
    return bench.render_tail_lines(
        warm, samples, timings, total=888.889, sf=0.1, extras=extras,
        idle_tag="LOADED load=8.88 waited=120s", cpu_calib_ms=88.8,
    )


def test_tail_lines_fit_driver_capture_at_max_population():
    warm_line, reps_line, final_line = _render_worst_case()
    tail = len(warm_line) + len(reps_line) + len(final_line) + 3
    assert tail < 1990, (
        f"bench tail {tail} chars at max key population — the driver's "
        "2000-char capture would clip a line; trim GATE_KEYS or rep "
        "precision before adding more"
    )


def test_every_gate_key_is_rendered_and_lines_parse():
    warm_line, reps_line, final_line = _render_worst_case()
    warm = json.loads(warm_line)
    assert warm["metric"] == "e2e_bench_warm"
    for k in bench.GATE_KEYS:
        assert k in warm, f"gate key {k} dropped from the warm line"
    reps = json.loads(reps_line)
    assert set(reps["reps"]) == set(BENCH_QUERIES)
    # per-rep loadavg renders as an integer (the ~80-char budget trade)
    assert all(
        isinstance(pair[1], int)
        for v in reps["reps"].values()
        for pair in v
    )
    final = json.loads(final_line)
    assert final["metric"] == "e2e_bench_seconds"
    assert set(final["queries"]) == set(BENCH_QUERIES)
    assert final["unit"] == "sec"


def test_bench_queries_not_removed():
    """The driver contract forbids removing or renaming bench entries;
    every name this round reported must still appear in bench.py."""
    src = open(bench.__file__).read()
    missing = [q for q in BENCH_QUERIES if f'"{q}"' not in src]
    assert not missing, f"bench queries removed/renamed: {missing}"
