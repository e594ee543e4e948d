"""The build pipeline: wordlist DataFrame → sorted hash-database Parquet.

Re-expresses the reference's build dataflow (ref
/root/reference/src/cli/build.rs:81-248) as one declarative Spark plan:

    words → non-empty filter (F1) → dropDuplicates (A1/P12)
          → multi-algorithm fanout via explode of array<struct> (H17)
          → dedup on (hash, algorithm) (J2)
          → [append-merge against an existing DB (J1)]
          → range-repartition + sort by hash (O1/P3)
          → ZSTD Parquet with native column bloom filter on `hash` (K1/P1)
          → sidecar stats JSON (K2/P4/P5)

Scale notes (the parts that matter at 100 TB):
  * The word dedup and record dedup are the only full shuffles before
    the required range-repartition for the sorted write; map-side
    partial aggregation applies to both.
  * The fanout multiplies rows by n_algorithms AFTER dedup, so each
    unique word is hashed exactly once per algorithm (ref's
    dedup-before-hash, build.rs:152-156 / P12) — Catalyst will not
    reorder a dedup across a UDF for us, so the plan encodes it.
  * Sorted-by-hash output files give every Parquet row group a tight
    min/max range on `hash`, which is what makes prefix queries prune
    (ref build.rs:208 + parquet.rs:493-516); uniformly-distributed
    digests make range partitioning skew-free by construction.
  * No driver-side loops: the reference's 100k-row batching
    (build.rs:16) is replaced by executor partitioning and spill.
"""

from __future__ import annotations

import json
import math
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shaha_spark import io_util
from shaha_spark.functions.hashers import resolve_hashers
from shaha_spark.schema import HASH_DB_SCHEMA, SIDECAR_NAME

#: Target rows per output file — digests are ~47.5 B/record on disk
#: (BASELINE.md), so 4M records ≈ 190 MB files, a healthy Parquet size.
DEFAULT_ROWS_PER_FILE = 4_000_000


def words_from_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    """Non-empty-line filter (F1, ref src/source/file.rs:39) → [word]."""
    return lines.select(F.col(column).alias("word")).filter(F.length("word") > 0)


def dedup_words(words: DataFrame) -> DataFrame:
    """Word-level distinct (A1, ref build.rs:134,152).

    The reference is first-wins over an ordered stream; rows here are
    identical strings, so any-wins distinct is equivalent.
    """
    return words.dropDuplicates(["word"])


def hash_fanout(
    words: DataFrame,
    algorithms: list[str],
    source_name: str | None = None,
    word_col: str = "word",
) -> DataFrame:
    """word × M hashers → M hash records (H17, ref build.rs:353-366).

    One pass over the input: M digest expressions are packed into an
    array<struct> and exploded, so the scan/dedup upstream is not
    repeated per algorithm.

    ``source_name=None`` omits the sources column. Keep it omitted
    through dedup: an array column in the dedup forces Spark into
    sort-based aggregation (arrays are not hash-agg buffer types), so
    the build attaches sources AFTER deduplication.
    """
    resolve_hashers(algorithms)  # validate names up front, like the CLI
    from shaha_spark.functions.hashers import hash_expr

    entries = F.array(
        *[
            F.struct(
                hash_expr(algo, F.col(word_col)).alias("hash"),
                F.lit(algo).alias("algorithm"),
            )
            for algo in algorithms
        ]
    )
    out = words.select(
        F.col(word_col).alias("preimage"),
        F.explode(entries).alias("entry"),
    ).select(
        F.col("entry.hash").alias("hash"),
        "preimage",
        F.col("entry.algorithm").alias("algorithm"),
    )
    if source_name is not None:
        out = out.withColumn("sources", F.array(F.lit(source_name)))
    return out


def dedup_records(records: DataFrame, strict: bool = False) -> DataFrame:
    """Dedup on the (hash, algorithm) key (J2, ref build.rs:368-371).

    Standalone operator form. ``build()`` itself no longer calls this:
    it folds the dedup into the range shuffle of the final sort
    (``sort_for_write(dedup=True)``), saving one full shuffle of the
    fanned-out records. Use this when you need the dedup WITHOUT the
    sorted-write layout.

    After word-level dedup, duplicates here can only arise from genuine
    digest collisions between distinct words; kept for semantic parity.

    Physical shape matters here: Spark's HashAggregateExec supports
    neither binary grouping keys nor string/binary aggregate buffers, so
    a naive ``dropDuplicates(["hash", "algorithm"])`` silently becomes a
    SORT-based aggregate — a full sort of the fanned-out records. The
    default path instead groups on (hex(hash), algorithm, preimage) with
    no aggregate functions, which stays a hash aggregate; because the
    preimage determines the digest, the result differs from first-wins
    only if two distinct preimages truly collide (2^-128 territory).
    ``strict=True`` restores exact first-wins at the sort-agg cost.
    """
    if strict:
        return records.dropDuplicates(["hash", "algorithm"])
    cols = records.columns
    return (
        records.withColumn("__hh", F.hex("hash"))
        .drop("hash")
        .dropDuplicates(["__hh", "algorithm", "preimage"])
        .withColumn("hash", F.unhex("__hh"))
        .drop("__hh")
        .select(*cols)
    )


def sort_for_write(
    records: DataFrame, num_files: int | None = None, dedup: bool = False
) -> DataFrame:
    """Global sort by hash bytes (O1/P3, ref build.rs:208).

    ``repartitionByRange`` samples the key distribution and assigns
    ordered, non-overlapping byte ranges to partitions; with the
    within-partition sort this yields a totally ordered dataset across
    output files, each row group carrying a tight min/max on `hash`.

    ``dedup=True`` folds the (hash, algorithm) record dedup (J2, ref
    build.rs:368-371) into the SAME shuffle: range partitioning on
    ``hash`` co-locates equal keys (equal values can never straddle a
    range boundary), so ``RangePartitioning(hash)`` satisfies the
    window's ``ClusteredDistribution(hash, algorithm)`` and Catalyst
    inserts NO extra exchange — the row_number dedup rides the sort the
    write needs anyway (and plan-rewrites to a WindowGroupLimit, so
    ranks never materialize). Versus a separate ``dropDuplicates``
    pass, this removes one full shuffle of the fanned-out records —
    measured 1.9 s -> 1.3 s at sf0.1, and at 100 TB it halves the
    largest data movement in the build. It is also STRICTER than the
    hash-friendly dedup in :func:`dedup_records`: true first-wins (min
    preimage) per (hash, algorithm), even for genuine digest
    collisions.
    """
    if num_files is not None:
        parts = records.repartitionByRange(num_files, "hash")
    else:
        parts = records.repartitionByRange("hash")
    if dedup:
        from pyspark.sql import Window

        w = Window.partitionBy("hash", "algorithm").orderBy("preimage")
        parts = (
            parts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return parts.sortWithinPartitions("hash", "algorithm")


def write_hashdb(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by_algorithm: bool = False,
) -> None:
    """Sorted ZSTD Parquet write with a native bloom filter on `hash`.

    The bloom filter replaces the reference's hand-serialized footer
    bloom (ref parquet.rs:24-29,444-461): Spark's vectorized Parquet
    reader consults it for equality predicates on `hash`, giving the
    same point-lookup short-circuit without custom code (P1).

    ``partition_by_algorithm=True`` lays the dataset out as Hive
    partitions ``algorithm=<name>/``, so algorithm-filtered queries
    prune whole directories (the reference keeps one mixed file and
    filters row-by-row, parquet.rs:551-553). Files stay hash-sorted
    within each partition: the range-repartition is hash-major, and the
    per-task split by algorithm preserves row order.
    """
    # ADAPTIVE bloom sizing (parquet-mr 1.13+): the writer tracks the
    # actual per-row-group ndv and keeps the smallest of its candidate
    # filters meeting the fpp target. The previous fixed 1M-ndv
    # declaration (mirroring ref parquet.rs:28,47-48) wrote a ~1.2 MB
    # bloom into EVERY file regardless of its rows — at bench scale
    # that was HALF the database's bytes (61.5 -> 32.2 B/record,
    # measured round 4), and at production scale (4M-row files) it
    # UNDERsized the filter 4x. Two measured caveats encode the final
    # shape: (1) an explicit expected.ndv declaration DISABLES adaptive
    # mode (parquet-mr uses the ndv-derived fixed size when given one),
    # so no ndv is set; (2) the candidate ladder is 5 sizes halving
    # from parquet.bloom.filter.max.bytes, so RAISING max.bytes lifts
    # the smallest candidate too (8 MB cap -> 512 KB floor per file) —
    # the 1 MB default cap (64 KB floor, ~4 bits/key on a production
    # 2M-hash row group) is the right trade: small files stay small,
    # and at production row-group sizes the capped bloom still
    # short-circuits absent keys while the sorted layout's min/max
    # pruning carries the primary skip. (File-count sizing is the
    # caller's job via estimate_num_files / sort_for_write.)
    # Write-leg knobs (optimization round 12, guide §6; measured by
    # scripts/ab_write_knobs.py, interleaved over 5 reps at sf0.1,
    # 541k records):
    #   * dictionary encoding OFF for `hash` and `preimage` — both are
    #     (near-)unique per row, so the dictionary always overflows to
    #     plain after buffering a page's worth of entries; the attempt
    #     itself is pure CPU+memory per row group. `algorithm` and
    #     `sources` keep their dictionaries (few distinct values).
    #   * zstd level 2 instead of the parquet-mr default 3 — the hash
    #     column (the bulk of the bytes) is incompressible at any
    #     level, so level 3's extra effort buys nothing there.
    #   Together: write 1.09 -> 0.98 s median, 31.93 -> 32.12
    #   bytes/record (+0.6%; still 0.68x the reference's ~47.5).
    #   Level 1 was 6% faster again but cost +7.8% bytes; dictionary-
    #   skip WITHOUT lowering the level measured slower (plain pages
    #   are bigger, and zstd-3 pays proportionally).
    writer = (
        df.write.mode(mode)
        .option("compression", "zstd")
        .option("parquet.compression.codec.zstd.level", "2")
        .option("parquet.enable.dictionary#hash", "false")
        .option("parquet.enable.dictionary#preimage", "false")
        .option("parquet.bloom.filter.enabled#hash", "true")
        .option("parquet.bloom.filter.adaptive.enabled", "true")
    )
    if partition_by_algorithm:
        writer = writer.partitionBy("algorithm")
    writer.parquet(path)


def write_sidecar(
    spark: SparkSession,
    path: str,
    *,
    total_records: int,
    algorithms: list[str],
    sources: list[str],
    source_hashes: list[str],
) -> None:
    """Sidecar stats JSON — stands in for the reference's Parquet footer
    key-value metadata (ref parquet.rs:20-26), which the DataFrame
    writer cannot emit. Written AFTER the data so a missing/stale
    sidecar degrades to the scan fallback (ref parquet.rs:577-581).
    """
    meta = {
        "total_records": total_records,
        "algorithms": sorted(set(algorithms)),
        "sources": sorted(set(sources)),
        "source_hashes": sorted(set(source_hashes)),
        "file_size_bytes": io_util.tree_size(spark, path),
        "bloom": {"column": "hash", "kind": "parquet-native"},
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "format_version": 1,
    }
    io_util.write_text(spark, f"{path.rstrip('/')}/{SIDECAR_NAME}", json.dumps(meta, indent=2))


def read_sidecar(spark: SparkSession, path: str) -> dict[str, Any] | None:
    raw = io_util.read_text(spark, f"{path.rstrip('/')}/{SIDECAR_NAME}")
    return json.loads(raw) if raw is not None else None


def read_hashdb(spark: SparkSession, path: str, validate: bool = False) -> DataFrame:
    """Schema-enforced read.

    The reference errors on schema mismatch (parquet.rs:294-313). Spark
    with an explicit schema would instead silently null out missing
    columns, so ``validate=True`` reproduces the reference's hard error
    by checking the file footer schema first (one driver-side footer
    read, no data scan).
    """
    if validate:
        actual = spark.read.parquet(path).schema
        expected_names = [f.name for f in HASH_DB_SCHEMA.fields]
        if [f.name for f in actual.fields] != expected_names:
            raise ValueError(
                f"Invalid schema: expected columns {expected_names}, "
                f"found {[f.name for f in actual.fields]} at {path}"
            )
    return spark.read.schema(HASH_DB_SCHEMA).parquet(path)


def build(
    spark: SparkSession,
    words: DataFrame,
    algorithms: list[str],
    output_path: str,
    *,
    source_name: str = "words",
    source_hash: str | None = None,
    append: bool = False,
    dry_run: bool = False,
    force: bool = False,
    num_files: int | None = None,
    word_col: str = "word",
    partition_by_algorithm: bool = False,
) -> dict[str, Any]:
    """End-to-end build (ref src/cli/build.rs:81-248). Returns the summary
    stats the reference prints at build.rs:234-248."""
    resolve_hashers(algorithms)
    existing_meta = read_sidecar(spark, output_path) if append else None
    if append and existing_meta is None and io_util.exists(spark, output_path):
        # Sidecar missing (deleted, or a crash between swap and sidecar
        # write): recover algorithms/sources by scanning, otherwise the
        # freshly written sidecar would confidently misreport the merged
        # dataset's provenance through info()'s metadata fast path.
        from shaha_spark.pipeline.stats import scan_stats

        recovered = scan_stats(spark, output_path)
        existing_meta = {
            "algorithms": recovered["algorithms"],
            "sources": recovered["sources"],
            "source_hashes": [],  # unknowable without the sidecar
        }

    # Idempotence gate (P5, ref build.rs:113-125): skip if this exact
    # source content was already ingested.
    if (
        not force
        and source_hash is not None
        and existing_meta is not None
        and source_hash in existing_meta.get("source_hashes", [])
    ):
        return {
            "skipped": True,
            "reason": "source already in database (use force=True to re-add)",
            "total_records": existing_meta["total_records"],
        }

    # NOTE: no forced repartition here — unlike the shingle operators,
    # the expensive work (hash fanout) runs on the reduce side of the
    # word-dedup shuffle, which already spreads it across the cluster;
    # measured: an extra upstream repartition only adds shuffle cost.
    words = words.select(F.col(word_col).alias("word")).filter(F.length("word") > 0)
    unique = dedup_words(words)

    if dry_run:
        # Ref build.rs:253-327: count-only pass, no write.
        total, n_unique = words.select(
            F.count(F.lit(1)).alias("t"),
        ).head()[0], unique.count()
        return {
            "dry_run": True,
            "total_words": total,
            "unique_words": n_unique,
            "duplicates": total - n_unique,
            "records_to_generate": n_unique * len(algorithms),
        }

    # The (hash, algorithm) record dedup (J2) is NOT a separate pass:
    # it rides the range shuffle inside sort_for_write(dedup=True)
    # below, saving one full shuffle of the fanned-out records.
    #
    # The constant `sources` array is attached AFTER that shuffle on
    # the fresh-build path (guide §2.3: shuffle fewer bytes): a
    # fresh build's sources column is the same one-element literal on
    # every row, so carrying it through the range sampling pass, the
    # exchange, and the window dedup is pure serialization overhead —
    # measured 1.76 s -> 1.40 s for the sort+write leg at sf0.1.
    # Appends keep it on the shuffled rows: there the merged arrays
    # are data-dependent.
    records = hash_fanout(unique, algorithms)

    swap = append and io_util.exists(spark, output_path)
    if swap and not partition_by_algorithm:
        # appending to an algorithm-partitioned database must keep the
        # layout — the merged rewrite replaces the WHOLE dataset, so
        # forgetting the flag here would silently flatten algorithm=
        # directories and drop pruning for every later filtered query
        # (compact_hashdb auto-detects the same way)
        from . import snapshot as _snapshot

        partition_by_algorithm = any(
            "/algorithm=" in p
            for p, _ in _snapshot.live_files(spark, output_path)
        )
    lock_path = None
    if swap:
        # Serialize concurrent appends to the same output: two builds
        # interleaving their read-merge-swap sequences would each merge
        # against the same base and silently drop the other's records.
        lock_path = output_path.rstrip("/") + ".__append_lock__"
        if not io_util.create_marker(spark, lock_path):
            raise RuntimeError(
                f"another append to {output_path} appears to be in progress "
                f"(lock file {lock_path} exists); if it is stale from a "
                "crashed build, delete it and retry"
            )
    try:
        merged_sources = [source_name]
        merged_hashes = [source_hash] if source_hash else []
        merged_algos = list(algorithms)
        if swap:
            from shaha_spark.pipeline.append import append_merge

            existing = read_hashdb(spark, output_path)
            records = append_merge(
                existing,
                records.withColumn("sources", F.array(F.lit(source_name))),
            )
            if existing_meta:
                merged_sources += existing_meta.get("sources", [])
                merged_hashes += existing_meta.get("source_hashes", [])
                merged_algos += existing_meta.get("algorithms", [])

        # Spark cannot rewrite its own input in place: write to a temp
        # sibling, then swap (ref rewrites the single file atomically;
        # this is the dataset-level equivalent).
        target = output_path if not swap else output_path.rstrip("/") + ".__tmp_append__"

        # Persist the fanned-out records across the range shuffle
        # (optimization round 12, guide §2.4/§5): repartitionByRange
        # runs a separate SAMPLING job over its input to pick range
        # boundaries, and that job re-evaluates the whole upstream —
        # here the digest kernels themselves (the build's dominant CPU;
        # the word-dedup shuffle above is reused as skipped stages, the
        # hash fanout is not). Materializing the records once means the
        # sample pass and the shuffle both read stored blocks instead
        # of hashing every word twice. Measured sf0.1: full
        # dedup+fanout+sort+write 2.05 → 1.62 s; at scale this removes
        # one full digest pass per build/append. Unpersisted in the
        # finally below so no blocks outlive the build (the r11 bench
        # forensics found exactly this class of leak).
        records = records.persist()
        sorted_records = sort_for_write(records, num_files=num_files, dedup=True)

        # total_records observed ON the write job itself (CollectMetrics
        # above the final sort) — no post-write read-back pass.
        from pyspark.sql import Observation

        obs = Observation("build_total_records")
        if not swap:
            # fresh build: constant sources attached post-shuffle (a
            # projection — per-partition order is preserved)
            sorted_records = sorted_records.withColumn(
                "sources", F.array(F.lit(source_name))
            )
        sorted_records = sorted_records.observe(obs, F.count(F.lit(1)).alias("n"))
        write_hashdb(
            sorted_records, target, mode="overwrite",
            partition_by_algorithm=partition_by_algorithm,
        )

        if swap:
            from . import snapshot

            old_live = snapshot.live_files(spark, output_path)
            snapshot.swap_live_tree(
                spark, output_path, target, old_live, op="append"
            )

        total_records = int(obs.get["n"])
        write_sidecar(
            spark,
            output_path,
            total_records=total_records,
            algorithms=merged_algos,
            sources=merged_sources,
            source_hashes=[h for h in merged_hashes if h],
        )
        return {
            "skipped": False,
            "total_records": total_records,
            "algorithms": sorted(set(merged_algos)),
            "sources": sorted(set(merged_sources)),
            "output_path": output_path,
        }
    finally:
        try:
            records.unpersist()
        except Exception:
            pass  # never let cleanup mask the build's own error
        if lock_path is not None:
            io_util.delete(spark, lock_path)


def estimate_num_files(expected_records: int) -> int:
    return max(1, math.ceil(expected_records / DEFAULT_ROWS_PER_FILE))
