"""A/B the hashdb parquet-write knobs (optimization guide §6).

The written data: hash (16/32 random bytes — incompressible), algorithm
(2 values), preimage (short strings), sources (constant array). Knobs:

  * zstd level (parquet.compression.codec.zstd.level, parquet-mr
    default 3) — random hash bytes don't compress, so higher levels
    may be pure CPU;
  * dictionary encoding on the hash column
    (parquet.enable.dictionary#hash) — values are unique, the
    dictionary always overflows to plain after buffering; the attempt
    itself costs CPU + memory per row group.

Times the WRITE of the same pre-materialized sorted records and
reports bytes/record per variant, interleaved over reps.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shaha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROTO_REPS", "5"))

spark = get_spark(app_name="ab-write", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
words = (
    docs.select(F.posexplode(F.split("text", " ")).alias("pos", "w"), F.col("doc_id"))
    .filter(F.col("w") != "")
    .select(
        F.concat_ws(
            "_", "w", F.col("doc_id").cast("string"), F.col("pos").cast("string")
        ).alias("word")
    )
)

from shaha_spark.pipeline.build import hash_fanout, sort_for_write

records = sort_for_write(
    hash_fanout(words.distinct(), ["sha256", "md5"]),
    num_files=1,
    dedup=True,
).withColumn("sources", F.array(F.lit("bench"))).localCheckpoint(eager=True)
n = records.count()
print(f"records: {n}")

VARIANTS = {
    "baseline": {},
    "zstd2+nodict": {
        "parquet.compression.codec.zstd.level": "2",
        "parquet.enable.dictionary#hash": "false",
        "parquet.enable.dictionary#preimage": "false",
    },
    "zstd1+nodicthash": {
        "parquet.compression.codec.zstd.level": "1",
        "parquet.enable.dictionary#hash": "false",
    },
    "zstd1+nodict": {
        "parquet.compression.codec.zstd.level": "1",
        "parquet.enable.dictionary#hash": "false",
        "parquet.enable.dictionary#preimage": "false",
    },
}

tmp = tempfile.mkdtemp(prefix="ab_write_")
times: dict[str, list[float]] = {k: [] for k in VARIANTS}
sizes: dict[str, int] = {}
for rep in range(REPS):
    for name, opts in VARIANTS.items():
        out = os.path.join(tmp, f"{name}_{rep}")
        w = (
            records.write.mode("overwrite")
            .option("compression", "zstd")
            .option("parquet.bloom.filter.enabled#hash", "true")
            .option("parquet.bloom.filter.adaptive.enabled", "true")
        )
        for k, v in opts.items():
            w = w.option(k, v)
        t0 = time.perf_counter()
        w.parquet(out)
        times[name].append(time.perf_counter() - t0)
        if rep == 0:
            sz = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(out)
                for f in fs
                if f.endswith(".parquet")
            )
            sizes[name] = sz
        shutil.rmtree(out, ignore_errors=True)

for name in VARIANTS:
    print(
        f"{name:14s} median={statistics.median(times[name]):.3f} "
        f"reps={[round(t, 2) for t in times[name]]} "
        f"bytes/rec={sizes[name] / n:.2f}"
    )
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
