"""Measure curation-surface throughput across scale factors.

Times one pass of (a) the composed curation chain
(pipeline.curate.curate_corpus: line dedup -> Gopher gate -> exact
dedup -> temperature mixture) and (b) MinHash LSH candidate-pair
generation, at each available sf directory, printing docs/sec — the
amortization curve SCALE.md records (fixed stage overhead shrinks
relative to volume, the trend the 100 TB case continues).

Run:  python scripts/measure_curation_curve.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from shaha_spark.pipeline.curate import curate_corpus
    from shaha_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from shaha_spark.session import get_spark

    spark = get_spark(app_name="curation-curve")
    spark.sparkContext.setLogLevel("ERROR")

    # warm codegen once on a tiny slice so compilation cost (a fixed
    # driver-side constant) stays out of every measurement
    tiny = spark.read.parquet(f"{SFS[0]}/documents.parquet").limit(50)
    curate_corpus(tiny, mix_col="lang").count()
    lsh_candidate_pairs(minhash_signatures(tiny)).count()

    print(f"{'sf_dir':<28}{'docs':>8}{'curate_s':>10}{'curate_d/s':>12}"
          f"{'lsh_s':>10}{'lsh_d/s':>12}")
    for sf in SFS:
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n = docs.count()
        t0 = time.perf_counter()
        curate_corpus(docs, mix_col="lang").count()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        lsh_candidate_pairs(minhash_signatures(docs)).count()
        tl = time.perf_counter() - t0
        print(f"{os.path.basename(sf):<28}{n:>8}{tc:>10.2f}{n / tc:>12.0f}"
              f"{tl:>10.2f}{n / tl:>12.0f}")


if __name__ == "__main__":
    main()
