"""Measure operator throughput BEYOND sf0.1 by replicating the sf0.1
inputs K-fold with key remapping, so the work is genuinely K x larger.

Replication discipline (no accidental free lunches):

* build words get a per-replica suffix -> every preimage is distinct,
  the dedup/fanout/sort/write stages all carry K x the rows;
* documents get a per-replica prefix on EVERY token -> replicas share
  no shingles, so MinHash/SimHash bucket sizes stay natural instead of
  collapsing all replicas into one mega-cluster;
* embeddings get remapped vec_ids (scoring cost is linear in corpus
  size, identical vectors don't change the work);
* every scaled input is materialized (localCheckpoint) and counted
  BEFORE the clock starts, so setup cost never pollutes the number.

The point of the curve: per-row cost should be FLAT or FALLING as K
grows (fixed stage overhead amortizes). A rising per-row cost would
flag an operator whose work grows super-linearly — the thing the
100 TB case cannot tolerate.

Run:  python scripts/scale_curve.py          (takes ~10 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_KS = [1, 4, 10]
WORD_KS = [1, 4, 10, 40]
EMB_KS = [1, 4, 10]


def main() -> None:
    from pyspark.sql import functions as F

    from shaha_spark.operators.dedup import (
        exact_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
    )
    from shaha_spark.operators.embeddings import sq_topk
    from shaha_spark.pipeline.build import build
    from shaha_spark.session import get_spark

    spark = get_spark(app_name="scale-curve")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    words1 = (
        docs.select(
            F.posexplode(F.split("text", " ")).alias("pos", "w"), F.col("doc_id")
        )
        .filter(F.col("w") != "")
        .select(
            F.concat_ws(
                "_", "w", F.col("doc_id").cast("string"), F.col("pos").cast("string")
            ).alias("word")
        )
    )
    n_docs1 = docs.count()
    n_emb1 = emb.count()

    # warm codegen on a tiny slice: compilation is a fixed driver cost,
    # not part of the per-row economics the curve measures
    tiny = docs.limit(50)
    lsh_candidate_pairs(minhash_signatures(tiny)).count()
    simhash(tiny).count()

    def scaled_docs(k: int):
        parts = []
        for r in range(k):
            salt = f"r{r}_"
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                    F.concat(
                        F.lit(salt), F.regexp_replace(F.col("text"), " ", f" {salt}")
                    ).alias("text"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out.localCheckpoint(eager=True)

    def scaled_words(k: int):
        parts = [
            words1.select(F.concat("word", F.lit(f"_{r}")).alias("word"))
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out.localCheckpoint(eager=True)

    def scaled_emb(k: int):
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out.localCheckpoint(eager=True)

    results: dict[str, list[dict[str, float]]] = {}

    def record(op: str, k: int, n: int, sec: float) -> None:
        row = {"k": k, "rows": n, "sec": round(sec, 3), "rows_per_sec": round(n / sec, 1)}
        results.setdefault(op, []).append(row)
        print(f"{op:<22} k={k:<3} rows={n:>9,} {sec:>8.2f}s {n / sec:>12,.0f} rows/s", flush=True)

    tmp = tempfile.mkdtemp(prefix="shaha_scale_")
    try:
        for k in WORD_KS:
            w = scaled_words(k)
            n = w.count()
            path = os.path.join(tmp, f"db{k}")
            t0 = time.perf_counter()
            build(spark, w, ["sha256", "md5"], path, source_name="scale")
            record("build_hashdb", k, n, time.perf_counter() - t0)
            shutil.rmtree(path, ignore_errors=True)
            w.unpersist()

        for k in DOC_KS:
            d = scaled_docs(k)
            n = d.count()
            t0 = time.perf_counter()
            lsh_candidate_pairs(minhash_signatures(d)).count()
            record("minhash_lsh_pairs", k, n, time.perf_counter() - t0)
            t0 = time.perf_counter()
            simhash(d).count()
            record("simhash", k, n, time.perf_counter() - t0)
            t0 = time.perf_counter()
            exact_dedup(d).count()
            record("exact_dedup", k, n, time.perf_counter() - t0)
            d.unpersist()

        queries = emb.orderBy("vec_id").limit(8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        ).localCheckpoint(eager=True)
        for k in EMB_KS:
            e = scaled_emb(k)
            n = e.count()
            t0 = time.perf_counter()
            sq_topk(e, queries, m=20, k=5).count()
            record("ann_sq_topk", k, n, time.perf_counter() - t0)
            e.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({"sf_dir": SF_DIR, "curves": results}))
    spark.stop()


if __name__ == "__main__":
    main()
