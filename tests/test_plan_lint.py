"""Registry-wide physical-plan lint: the scale anti-pattern audit the
round-3 verdict performed by hand, made mechanical and permanent.

Every ``queries()`` entry is planned (not executed) at sf0.001 and its
executedPlan checked for the three plan shapes that do not survive a
100 TB input:

* ``CartesianProduct`` — a non-broadcast cross join. Never acceptable:
  every crossJoin in the package is against a broadcast model-sized
  frame, which plans as BroadcastNestedLoopJoin instead.
* ``BatchEvalPython`` — a row-at-a-time Python UDF on the data path.
  Python is only allowed Arrow-batched (ArrowEvalPython,
  FlatMapGroupsInPandas, MapInPandas, ...).
* an UNPARTITIONED window (physical ``Exchange SinglePartition``
  feeding a Window/WindowGroupLimit) — all rows through one task.
  Acceptable ONLY over provably reduced-cardinality input (calendar
  days, strata, score buckets, block ids); every such query must be
  enrolled in GLOBAL_WINDOW_OK with its cardinality argument.

New registry entries failing these checks need a design change, not an
allowlist entry — the allowlist exists for inputs whose cardinality is
bounded by construction, nothing else.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod

#: query -> why a single-partition window is safe there (the window's
#: input cardinality is bounded by construction, not by data volume).
GLOBAL_WINDOW_OK = {
    "docs_split_balance": "total over per-split counts — one row per "
                          "(domain, split) after the corpus-side "
                          "hash-agg (3 splits here; policy-sized, "
                          "never data-sized — sampling.split_balance)",
    "docs_packed": "running sum over block ids: n/BLOCK rows (distributed "
                   "prefix-sum design, chunking.py pack_sequences)",
    "events_cumulative_users": "running sum over calendar days "
                               "(~365 rows/year after the per-day agg)",
    "docs_auc": "running TPR/FPR over score thresholds — input is the "
                "per-threshold agg (<=1k buckets, classifier.py)",
    "users_survival": "Kaplan-Meier product over lifetime buckets "
                      "(bounded horizon, one row per period)",
    "docs_temperature_rates": "normalizing constant over strata "
                              "(one row per lang)",
    "docs_temperature_resample": "same strata-cardinality normalization",
    "docs_token_budget": "running offset over score buckets "
                         "(score_range/bucket_width rows — the "
                         "value-bucketed distributed prefix sum, "
                         "sampling.token_budget_select)",
    "events_ks": "running offset over value buckets (n_buckets=256 "
                 "rows at any scale — the same distributed prefix-sum "
                 "shape, profile.ks_2samp)",
    "events_quantile_disc": "running offset over value buckets "
                            "(n_buckets=256 rows at any scale — the "
                            "ks_2samp distributed prefix-sum shape, "
                            "profile.quantile_disc)",
    "events_seasonality": "grand totals over calendar cells (≤168 "
                          "rows — 7 dow × 24 hod — at any scale, "
                          "timeseries.seasonal_profile)",
    "docs_isotonic": "prefix sums over score bins (≤64 rows at any "
                     "scale, classifier.isotonic_fit — newly VISIBLE "
                     "to this lint in r10: the bin-table boundary "
                     "migrated localCheckpoint→persist, so the plan "
                     "no longer truncates above it)",
    "docs_vocab_growth": "prefix sums over the bucket spine — exactly "
                         "n_buckets=16 rows at any scale (the "
                         "distributed prefix-sum shape, "
                         "terms.vocab_growth)",
    "docs_dup_source_matrix": "pair-total over the source-pair matrix "
                              "— ≤ |sources|² rows after the hash-agg "
                              "(policy-sized, never data-sized; "
                              "dedup.near_dup_source_matrix)",
}


#: query -> {table: max same-table scans} for queries that legitimately
#: read one table more than SCAN_REPEAT_THRESHOLD times. Every entry is
#: a set of INDEPENDENT single passes (train/encode/search stages,
#: self-join sides, marginal counts) — not the compounding re-derivation
#: the lint exists to catch (the round-5 audit found a curation chain
#: re-running its upstream 24 times because each stage's keep-set join
#: consumed the same lineage twice; see pipeline/curate.py).
SCAN_REPEAT_OK: dict[str, dict[str, int]] = {
    "docs_quality_bundle": {
        # Five independent SINGLE passes, one per signal family
        # (quality_score, lang_id, gopher_rules, license_scan,
        # url_policy_scan) — the bundle deliberately COMPOSES the five
        # verified operators so its values are theirs by construction
        # (textops.quality_signal_bundle docstring); no pass consumes
        # another's re-executed subtree, nothing compounds. A fused
        # single-pass variant would save four scans at the cost of
        # forking every signal's verified logic.
        "documents": 5,
    },
    "emb_ivf_pq_topk": {
        # ivf_assign + pq_encode + the query batch are independent
        # single passes (the first two are write-time products in
        # production — see ann_index.build_ivf_pq_index, which pays
        # them once at ingest); session cache state renders 3 or 4
        # scans for the same plan (r9 in-suite observation).
        "embeddings": 4,
    },
    "emb_ivf_pq_refine_topk": {
        # Four independent SINGLE passes (r11): three query-batch
        # derivations — the coarse probe, the broadcast ADC table,
        # and the refine stage's broadcast query frame — each reading
        # the 1% vec_id%100 slice, plus ONE full corpus pass fetching
        # exact vectors for the broadcast candidate list (the refine
        # point: candidates are |queries|·4·k rows, so the fetch is a
        # broadcast semi-join on a single scan, and in production it
        # prunes through a vector-bearing bucketed layout). No pass
        # consumes another's re-executed subtree; nothing compounds.
        "embeddings": 4,
    },
    "emb_ann_recall": {
        # The recall GATE deliberately runs BOTH retrieval pipelines —
        # exact brute-force (corpus + query side) and IVF (assignment
        # + probed search) — over the same table and joins their
        # top-k lists; the passes are independent by construction
        # (comparing two pipelines IS the operator). Production runs
        # the gate on a sample, not the corpus.
        "embeddings": 4,
    },
    "docs_substr_decontaminate_screened": {
        # Five independent SINGLE passes, three train-side + two
        # eval-side (the fixture derives both splits from one table;
        # production eval is a separate benchmark-sized table):
        # (1) the W-aligned screen explode — 1/W of the base
        #     operator's window volume, the point of the variant;
        # (2) the exact stride-1 explode over SCREENED docs only —
        #     contamination-sized, not corpus-sized;
        # (3) the id-spine projection for the 0-span left join;
        # (4)+(5) the eval W- and min_len-window sets — benchmark-
        #     sized, broadcast. No pass consumes another's output
        #     twice, so nothing compounds.
        "documents": 5,
    },
}

#: A table scanned more than this many times in one query is flagged
#: unless enrolled above with its independent-passes argument. Three is
#: the ceiling the legitimate multi-pass queries need (hash-split LM
#: train+score halves, dim-stats + encode + re-rank ANN stages,
#: self-join sides + marginals + totals — all independent single
#: passes). Tightened from 4 in r9 (VERDICT r8 #4: a 4-scan
#: single-statistic plan — events_quantile_disc — passed the old
#: threshold; its fix was a lazy localCheckpoint on the
#: twice-consumed per-value agg, and a full registry audit after it
#: found NO query above 3). Catalyst's join-strategy choice can move a
#: borderline plan by one scan depending on session history — if a
#: legitimately-3-scan query flips to 4 under suite ordering, enroll
#: it in SCAN_REPEAT_OK with ceiling 4 and the argument, don't raise
#: this back. The compounding re-derivation this lint exists to catch
#: starts far above this (measured 6-24 before the round-5 stage
#: boundaries).
SCAN_REPEAT_THRESHOLD = 3


@pytest.fixture(scope="module")
def plans(spark):
    sf = "/root/testdata/sf0.001"
    # Render from a clean cache catalog: the CacheManager substitutes
    # any REGISTERED plan-equal fragment into fresh plans, so renders
    # drift with whatever earlier tests happened to persist (r9: the
    # same query rendered 3 or 4 embeddings scans in-suite vs
    # in-isolation). Clearing first makes every lint count
    # deterministic; caches are a performance artifact, never a
    # correctness dependency, so dropping them mid-suite is safe.
    out = {}
    for name, fn in entry_mod.queries().items():
        spark.catalog.clearCache()  # per query: construction may persist
        df = fn(spark, sf)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def _indent(line: str) -> int:
    m = re.search(r"[+:]-\s", line)
    return m.start() if m else 0


def _single_partition_windows(plan: str) -> list[str]:
    """Window/WindowGroupLimit nodes whose nearest child exchange is
    SinglePartition — i.e. truly global windows."""
    lines = plan.split("\n")
    hits = []
    for i, ln in enumerate(lines):
        if not re.search(r"\b(Window|WindowGroupLimit)\b", ln):
            continue
        d = _indent(ln)
        for nxt in lines[i + 1:]:
            nd = _indent(nxt)
            if nxt.strip() and nd <= d and ("+-" in nxt or ":-" in nxt):
                break
            if "Exchange SinglePartition" in nxt:
                hits.append(ln.strip()[:80])
                break
            if "Exchange" in nxt:
                break
    return hits


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, (
        f"non-broadcast cross joins (O(n*m) at scale): {bad} — broadcast "
        "the small side or bucket the join"
    )


def test_no_row_at_a_time_python_udfs(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, (
        f"row-at-a-time Python UDFs on the data path: {bad} — use a "
        "pandas_udf (ArrowEvalPython) instead"
    )


def test_global_windows_are_enrolled_with_cardinality_argument(plans):
    flagged = {
        n: _single_partition_windows(p)
        for n, p in plans.items()
        if _single_partition_windows(p)
    }
    unexplained = {n: w for n, w in flagged.items() if n not in GLOBAL_WINDOW_OK}
    assert not unexplained, (
        f"single-partition windows without a documented cardinality bound: "
        f"{unexplained} — either repartition the window or enroll the query "
        "in GLOBAL_WINDOW_OK with the argument for why its input is small"
    )


def test_allowlist_has_no_stale_entries(plans):
    flagged = {
        n for n, p in plans.items() if _single_partition_windows(p)
    }
    stale = set(GLOBAL_WINDOW_OK) - flagged
    assert not stale, (
        f"GLOBAL_WINDOW_OK entries whose queries no longer plan a global "
        f"window (delete them): {stale}"
    )


#: the fixture base tables — the lint counts THESE only. Paths of
#: engine-written databases (part-*.parquet, forget-*.zstd.parquet,
#: snapshot copies) are excluded: a FileScan node prints several file
#: paths per location, so counting arbitrary *.parquet strings would
#: make the lint depend on how many files previous tests happened to
#: leave in the scratch warehouse rather than on the plan shape.
_BASE_TABLES = (
    "region|nation|customer|supplier|part|orders|lineitem|events|"
    "documents|embeddings"
)


def _strip_cached_subtrees(plan: str) -> str:
    """Remove cache-backed render content before scan counting.

    Cached reads are ONE compute by definition: each consumer's
    InMemoryTableScan/InMemoryRelation node re-renders the cached
    child plan — inline on the node's own line once materialized,
    or as an indented child block when fresh (r9 observed BOTH,
    drifting with session cache state). Counting those mentions would
    flag the very mechanism that fixes rescans, and unstably so.
    Excise the node line AND any deeper-indented block under it.
    """

    def depth(line: str) -> int:
        # tree prefix is spaces and ':' continuation bars up to '+- '
        return len(line) - len(line.lstrip(" :"))

    out: list[str] = []
    skip_deeper_than: int | None = None
    for line in plan.splitlines():
        d = depth(line)
        if skip_deeper_than is not None:
            if d > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryTableScan" in line or "InMemoryRelation" in line:
            skip_deeper_than = d
            continue
        out.append(line)
    return "\n".join(out)


def _repeated_scans(plan: str) -> dict[str, int]:
    from collections import Counter

    tables = re.findall(
        rf"\b({_BASE_TABLES})\.parquet", _strip_cached_subtrees(plan)
    )
    return {
        t: c for t, c in Counter(tables).items() if c > SCAN_REPEAT_THRESHOLD
    }


def test_no_compounding_table_rescans(plans):
    """Spark re-evaluates a DataFrame's lineage once per join consumer;
    a chain where every stage consumes its input twice compounds to
    2^stages scans of the base table. Each query may scan one table at
    most SCAN_REPEAT_THRESHOLD times, unless enrolled in SCAN_REPEAT_OK
    with the argument for why its passes are independent (and a count
    ceiling, so a later regression past the documented number still
    fails)."""
    bad = {}
    for name, plan in plans.items():
        for table, count in _repeated_scans(plan).items():
            allowed = SCAN_REPEAT_OK.get(name, {}).get(table, SCAN_REPEAT_THRESHOLD)
            if count > allowed:
                bad[(name, table)] = count
    assert not bad, (
        f"tables re-scanned beyond their documented pass count: {bad} — "
        "a twice-consumed stage input compounds at scale; cut it with a "
        "lazy localCheckpoint (see pipeline/curate.py) or enroll the "
        "independent passes in SCAN_REPEAT_OK"
    )


def test_scan_repeat_allowlist_not_stale(plans):
    """An enrolled query whose plan now sits COMFORTABLY below the
    threshold is stale documentation — delete it. 'Comfortably' means
    strictly below the threshold itself: a query that renders AT the
    threshold in one session state and one scan above it in another
    (cache-substitution drift, r9: emb_ivf_pq_topk renders 3 or 4)
    legitimately keeps its enrollment."""
    from collections import Counter

    stale = set()
    for n, ceilings in SCAN_REPEAT_OK.items():
        if n not in plans:
            continue
        counts = Counter(
            re.findall(
                rf"\b({_BASE_TABLES})\.parquet",
                _strip_cached_subtrees(plans[n]),
            )
        )
        if all(counts.get(t, 0) < SCAN_REPEAT_THRESHOLD for t in ceilings):
            stale.add(n)
    assert not stale, (
        f"SCAN_REPEAT_OK entries whose queries are now comfortably below "
        f"the scan threshold (delete them): {stale}"
    )


def test_no_broadcast_of_unbounded_side(plans):
    """BroadcastNestedLoopJoin is the broadcast-crossJoin pattern used
    for model-sized frames (centroids, codebooks, scalar thresholds).
    Guard the pattern stays rare: a blow-up here means someone
    broadcast a data-sized frame."""
    counts = {
        n: p.count("BroadcastNestedLoopJoin") for n, p in plans.items()
    }
    heavy = {n: c for n, c in counts.items() if c > 4}
    assert not heavy, (
        f"suspiciously many nested-loop broadcasts: {heavy} — check no "
        "data-scale frame is being broadcast"
    )
