"""Focused value-identity pins for the round-12 optimizations.

Each optimization rewrote HOW an operator builds its plan (SQL-string
expressions, materialized token arrays, two-level decimal aggregation,
post-shuffle constant attach) with the contract that the VALUES are
bit-identical. These tests keep the legacy Column-by-Column forms
in-repo as executable specifications and compare outputs exactly, so a
future Spark version or edit that breaks the equivalence fails loudly
here rather than at the driver's oracle gate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return v


def _rows(df):
    return sorted(
        [tuple(_norm(v) for v in r) for r in df.collect()], key=repr
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_minhash_signatures_match_legacy_column_form(spark, docs):
    from shaha_spark.functions.text import h28, perm_hash, shingles, tokens
    from shaha_spark.operators.constants import (
        MINHASH_PERMS,
        MINHASH_SENTINEL,
        SHINGLE_N,
    )
    from shaha_spark.operators.dedup import minhash_signatures

    # the pre-r12 builder: tokens inlined into the shingle transform,
    # permutation aggregates built Column-by-Column
    sh = shingles(tokens(F.col("text")), SHINGLE_N)
    hashed = docs.select(
        F.col("doc_id"), F.explode_outer(sh).alias("__shingle")
    ).select(F.col("doc_id"), h28(F.col("__shingle")).alias("__h"))
    sentinel = F.lit(MINHASH_SENTINEL).cast("long")
    legacy = hashed.groupBy("doc_id").agg(
        *[
            F.coalesce(F.min(perm_hash(F.col("__h"), a, b)), sentinel).alias(
                f"mh_{i}"
            )
            for i, (a, b) in enumerate(MINHASH_PERMS)
        ]
    )
    assert _rows(minhash_signatures(docs)) == _rows(legacy)


def test_simhash_matches_legacy_column_form(spark, docs):
    from shaha_spark.functions.text import h32, tokens
    from shaha_spark.operators.constants import SIMHASH_BITS
    from shaha_spark.operators.dedup import simhash

    bits = SIMHASH_BITS
    hashed = docs.select(
        F.col("doc_id"), F.explode_outer(tokens(F.col("text"))).alias("__tok")
    ).select(F.col("doc_id"), h32(F.col("__tok")).alias("__h"))
    per_bit = [
        F.sum(
            F.when(F.col("__h").isNull(), 0)
            .when(F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"__s_{j}")
        for j in range(bits)
    ]
    sums = hashed.groupBy("doc_id").agg(*per_bit)
    fp = sum(
        F.when(F.col(f"__s_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(bits)
    )
    legacy = sums.select(F.col("doc_id"), fp.alias("simhash"))
    assert _rows(simhash(docs)) == _rows(legacy)


def test_tpch_q1_two_level_matches_single_level(spark):
    import __spark_entry__ as entry
    from shaha_spark.operators.profile import split_cast_double as _sc

    _dec = lambda c, p="decimal(12,2)": F.col(c).cast(p)  # noqa: E731
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(4,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(4,2)"))
    charge = disc_price * (one + _dec("l_tax", "decimal(4,2)"))
    legacy = li.groupBy("l_returnflag", "l_linestatus").agg(
        _sc(F.sum(_dec("l_quantity")), 2).alias("sum_qty"),
        _sc(F.sum(_dec("l_extendedprice")), 2).alias("sum_base_price"),
        _sc(F.sum(disc_price), 4).alias("sum_disc_price"),
        _sc(F.sum(charge), 6).alias("sum_charge"),
        (_sc(F.sum(_dec("l_quantity")), 2) / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )
    assert _rows(entry.q_tpch_q1(spark, SF_DIR)) == _rows(legacy)


def test_build_fresh_attaches_sources_after_sort(spark, tmp_path):
    """Fresh builds attach the constant sources array post-shuffle;
    the written rows must still carry it (and stay hash-sorted)."""
    from shaha_spark.pipeline.build import build, read_hashdb

    words = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("alpha",)], "word string"
    )
    out = str(tmp_path / "db")
    res = build(spark, words, ["sha256", "md5"], out, source_name="srcx")
    assert res["total_records"] == 6  # 3 unique words x 2 algorithms
    rows = read_hashdb(spark, out).collect()
    assert len(rows) == 6
    assert all(list(r.sources) == ["srcx"] for r in rows)
    hashes = [bytes(r.hash) for r in rows]
    # the dataset remains globally hash-sorted (range partitioning is
    # upstream of the constant projection)
    df = read_hashdb(spark, out)
    import pyspark.sql.functions as SF

    per_part = df.select(
        SF.spark_partition_id().alias("p"), SF.hex("hash").alias("h")
    ).collect()
    by_part: dict[int, list[str]] = {}
    for r in per_part:
        by_part.setdefault(r.p, []).append(r.h)
    for hs in by_part.values():
        assert hs == sorted(hs)
    assert len(hashes) == 6


def test_brute_force_topk_numpy_kernel_matches_fold_semantics(spark):
    """The r12 Arrow/numpy scoring kernel must reproduce the JVM
    fold's pair semantics: null list, null element, and length
    mismatch -> null cosine; a literal NaN VALUE -> NaN cosine (not
    null); valid pairs -> the same 6-decimal-rounded cosine; ids of
    any type; empty query batches -> empty result with the schema."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    from shaha_spark.operators.similarity import brute_force_topk

    sch = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0]),
            (1, [3.0, 2.0, 1.0]),
            (2, None),                      # null list
            (3, [1.0, None, 2.0]),          # null element
            (4, [1.0, 2.0]),                # ragged dim
            (6, [float("nan"), 1.0, 2.0]),  # literal NaN value
        ],
        sch,
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 1.0, 1.0]), (12, [2.0, 1.0])], sch
    ).select(F.col("vec_id").alias("query_id"), "embedding")

    rows = {
        (r.query_id, r.vec_id): (r.cosine, r.rank)
        for r in brute_force_topk(corpus, queries, k=6).collect()
    }
    # NaN sorts first under DESC (Spark treats NaN > any double)
    c, rank = rows[(10, 6)]
    assert math.isnan(c) and rank == 1
    # valid pairs: exact rounded cosines, ranked after NaN
    assert rows[(10, 0)] == (0.92582, 2)
    assert rows[(10, 1)] == (0.92582, 3)
    # null pairs (null list / null element / dim mismatch) rank last,
    # tie-broken by corpus id
    assert rows[(10, 2)][0] is None
    assert rows[(10, 3)][0] is None
    assert rows[(10, 4)][0] is None
    # the 2-dim query scores only the 2-dim corpus row
    assert rows[(12, 4)] == (0.8, 1)
    assert rows[(12, 0)][0] is None
    # empty query batch: empty result, full schema intact
    empty = brute_force_topk(corpus, queries.where(F.lit(False)), k=3)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "vec_id", "cosine", "rank",
    ]


def test_brute_force_topk_numpy_kernel_partitioning_invariant(spark):
    """A pair's cosine must not depend on how the corpus is batched
    or partitioned (einsum optimize=False keeps accumulation order
    fixed per pair)."""
    from shaha_spark.operators.similarity import brute_force_topk

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    base = _rows(brute_force_topk(embs, queries, k=5))
    for parts in (1, 7):
        again = _rows(
            brute_force_topk(embs.repartition(parts), queries, k=5)
        )
        assert again == base, f"partitioning {parts} changed results"


def test_split_cast_spark_sql_text_matches_column_form(spark):
    """The SQL-text renderer (one parser call) must produce the same
    values as the Column builder across the whole domain structure:
    in-domain, both sides of the 2^53*10^10 guard boundary, negative,
    zero, and NULL magnitudes, at several scales."""
    from decimal import Decimal

    from shaha_spark.operators.profile import (
        _SPLIT_LIMIT,
        split_cast_double,
        split_cast_double_spark_sql,
    )

    lim = Decimal(_SPLIT_LIMIT)
    vals = [
        Decimal("0"),
        Decimal("1.23"),
        Decimal("-1.23"),
        Decimal("12345678901234.56"),       # hi/lo both populated
        Decimal("-12345678901234.56"),
        (lim - 1).scaleb(-2),               # u = limit-1 (last in-domain)
        (lim).scaleb(-2),                   # u = limit (first NULL)
        (lim + 1).scaleb(-2),
        -((lim - 1).scaleb(-2)),
        -((lim).scaleb(-2)),
        None,
    ]
    df = spark.createDataFrame(
        [(v,) for v in vals], "v decimal(38,2)"
    )
    for scale in (2, 4, 6):
        got = df.select(
            F.expr(split_cast_double_spark_sql("v", scale)).alias("x")
        )
        want = df.select(split_cast_double(F.col("v"), scale).alias("x"))
        assert _rows(got) == _rows(want), f"scale {scale} diverged"


def test_lsh_bands_sql_text_matches_column_form(spark, docs):
    """lsh_bands' single-SQL-string band array must reproduce the
    legacy Column-by-Column struct array exactly."""
    from shaha_spark.operators.constants import LSH_BANDS, LSH_ROWS_PER_BAND
    from shaha_spark.operators.dedup import lsh_bands, minhash_signatures

    sigs = minhash_signatures(docs.limit(200))
    legacy_bands = []
    for band in range(LSH_BANDS):
        lo = band * LSH_ROWS_PER_BAND
        key = F.concat_ws(
            "-",
            *[
                F.col(f"mh_{i}").cast("string")
                for i in range(lo, lo + LSH_ROWS_PER_BAND)
            ],
        )
        legacy_bands.append(
            F.struct(F.lit(band).alias("band_idx"), key.alias("band_key"))
        )
    legacy = (
        sigs.select(
            F.col("doc_id"), F.explode(F.array(*legacy_bands)).alias("band")
        ).select(
            "doc_id",
            F.col("band.band_idx").alias("band_idx"),
            F.col("band.band_key").alias("band_key"),
        )
    )
    assert _rows(lsh_bands(sigs)) == _rows(legacy)


def test_pq_train_grouped_matches_sequential_fits(spark):
    """pq_train's single grouped Lloyd run must reproduce the legacy
    per-subspace kmeans_fit loop exactly (same codebooks, bit-for-bit:
    decimal means are order-free, the argmax window adds sub_id to its
    partition key without changing per-group candidates or tie order)."""
    from shaha_spark.operators.kmeans import kmeans_fit
    from shaha_spark.operators.pq import _subvec, pq_train

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def legacy(corpus, m=4, k=16, iters=2, vec_col="embedding", id_col="vec_id"):
        dim = (
            corpus.where(F.col(vec_col).isNotNull())
            .select(F.size(vec_col).alias("d"))
            .first()["d"]
        )
        sub_dim = dim // m
        books = []
        for sub in range(m):
            sliced = corpus.select(
                F.col(id_col), _subvec(F.col(vec_col), sub, sub_dim).alias(vec_col)
            )
            cb = kmeans_fit(sliced, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
            books.append(
                cb.select(F.lit(sub).alias("sub_id"), "centroid_id", "centroid")
            )
        out = books[0]
        for b in books[1:]:
            out = out.unionByName(b)
        return out

    want = _rows(legacy(emb))
    got = _rows(pq_train(emb))
    assert got == want


def test_table_profile_sql_text_matches_column_form(spark):
    """table_profile's SQL-text split-cast aggregates must reproduce
    the legacy Column-built form exactly."""
    from shaha_spark.operators.profile import (
        _dec_scale,
        split_cast_double,
        table_profile,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    columns = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    precision = "decimal(18,2)"
    sc = _dec_scale(precision)
    aggs = []
    for c in columns:
        dec = F.col(c).cast(precision)
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
            split_cast_double(F.sum(dec), sc).alias(f"__s_{c}"),
            split_cast_double(F.sum(dec * dec), 2 * sc).alias(f"__sq_{c}"),
        ]
    one = li.agg(*aggs)
    structs = []
    for c in columns:
        n = F.col(f"__n_{c}")
        s = F.col(f"__s_{c}")
        sq = F.col(f"__sq_{c}")
        mean = s / n
        var = F.when(
            n > 1, F.greatest((sq - s * s / n) / (n - F.lit(1)), F.lit(0.0))
        ).otherwise(F.lit(0.0))
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                n.alias("n"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
                mean.alias("mean_value"),
                F.sqrt(var).alias("stddev_value"),
            )
        )
    legacy = one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    assert _rows(table_profile(li, columns, precision)) == _rows(legacy)


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_mean_grid_and_matvec_match_legacy_forms(spark):
    """_mean_grid's SQL-text aggregates and _matvec's broadcast-v form
    must reproduce the legacy Column-built / literal-v forms exactly."""
    from shaha_spark.operators.embeddings import (
        _dim,
        _matvec,
        _mean_grid,
        centered_grid,
    )
    from shaha_spark.operators.profile import split_cast_double

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d = _dim(emb, "embedding")
    legacy_aggs = [
        (
            split_cast_double(
                F.sum(
                    F.element_at(F.col("embedding"), p + 1)
                    .cast("double")
                    .cast("decimal(25,10)")
                ),
                10,
            )
            / F.count(F.element_at(F.col("embedding"), p + 1))
        )
        .cast("float")
        .alias(f"m{p}")
        for p in range(d)
    ]
    row = emb.agg(*legacy_aggs).head()
    legacy_means = [float(row[f"m{p}"]) for p in range(d)]
    assert [repr(m) for m in _mean_grid(emb, "embedding")] == [
        repr(m) for m in legacy_means
    ]

    grid, _ = centered_grid(emb, "embedding")
    grid = grid.select("__xq").localCheckpoint(eager=True)
    v = [1] * d
    u1 = _matvec(grid, v)

    def matvec_legacy(df, v):
        varr = F.array(
            *[F.lit(str(int(c))).cast("decimal(38,0)") for c in v]
        )
        dot = F.aggregate(
            F.zip_with(
                F.col("__xq"), varr, lambda x, y: x.cast("decimal(38,0)") * y
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, t: acc + t,
        )
        with_dot = df.select("__xq", dot.alias("__dot"))
        aggs = [
            F.sum(
                F.element_at(F.col("__xq"), p + 1).cast("decimal(38,0)")
                * F.col("__dot")
            ).alias(f"u{p}")
            for p in range(len(v))
        ]
        r = with_dot.agg(*aggs).head()
        return [int(r[f"u{p}"]) for p in range(len(v))]

    assert u1 == matvec_legacy(grid, v)
    # second round exercises the beyond-long magnitudes
    assert _matvec(grid, u1) == matvec_legacy(grid, u1)


def test_bootstrap_ci_sql_text_matches_column_form(spark):
    """bootstrap_mean_ci's SQL-text aggregate/projection split must
    reproduce the legacy Column-built aggregates exactly."""
    from shaha_spark.operators.profile import (
        _dec_scale,
        bootstrap_mean_ci,
        split_cast_double,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = _rows(bootstrap_mean_ci(ev, "value", "event_id"))

    # legacy tail: Column-built aggregates over the same staged weights
    precision = "decimal(12,2)"
    sc = _dec_scale(precision)
    n_reps, salt = 40, "boot"
    x = F.col("value").cast(precision)
    filtered = ev.where(F.col("value").isNotNull())
    n_groups = (n_reps + 3) // 4
    from shaha_spark.operators.profile import _POIS1_CUTS

    digests = filtered.select(
        F.col("value"),
        *[
            F.expr(
                f"md5(concat(cast(`event_id` as string), '|{g}|{salt}'))"
            ).alias(f"__d_{g}")
            for g in range(n_groups)
        ],
    )
    uniforms = digests.select(
        F.col("value"),
        *[
            F.expr(
                f"cast(conv(substring(__d_{b // 4}, {1 + 7 * (b % 4)}, 7),"
                " 16, 10) as long)"
            ).alias(f"__u_{b}")
            for b in range(n_reps)
        ],
    )

    def _w_sql(b):
        branches = " ".join(
            f"WHEN __u_{b} < {cut} THEN {k}" for k, cut in enumerate(_POIS1_CUTS)
        )
        return f"(CASE {branches} ELSE 5 END)"

    weighted = uniforms.select(
        F.col("value"),
        *[F.expr(_w_sql(b)).alias(f"__w_{b}") for b in range(n_reps)],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        (split_cast_double(F.sum(x), sc) / F.count(F.lit(1))).alias("mean_value"),
    ]
    for b in range(n_reps):
        w = F.col(f"__w_{b}")
        aggs.append(
            F.when(
                F.sum(w) > 0,
                split_cast_double(F.sum(x * w), sc) / F.sum(w).cast("double"),
            ).alias(f"__m_{b}")
        )
    one = weighted.agg(*aggs)
    reps = F.sort_array(
        F.array(
            *[
                F.coalesce(F.col(f"__m_{b}"), F.col("mean_value"))
                for b in range(n_reps)
            ]
        )
    )
    k = int((0.05 / 2.0) * n_reps)
    legacy = one.select(
        "n",
        "mean_value",
        F.element_at(reps, k + 1).alias("ci_lo"),
        F.element_at(reps, n_reps - k).alias("ci_hi"),
        F.lit(n_reps).cast("int").alias("n_reps"),
    )
    assert got == _rows(legacy)


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_ivf_pq_train_matches_sequential_pair(spark):
    """ivf_pq_train's fused grouped Lloyd run (coarse fit riding along
    as group -1 beside the m subspace fits) must reproduce the legacy
    sequential kmeans_fit + pq_train pair exactly — including with
    k_coarse != k_sub, where the shared seed TakeOrdered is trimmed
    per group."""
    from shaha_spark.operators.kmeans import kmeans_fit
    from shaha_spark.operators.pq import ivf_pq_train, pq_train

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    for k_coarse, k_sub in [(8, 16), (16, 8), (4, 4)]:
        coarse, books = ivf_pq_train(
            emb, k_coarse=k_coarse, m=4, k_sub=k_sub, iters=2
        )
        want_coarse = _rows(kmeans_fit(emb, k=k_coarse, iters=2))
        want_books = _rows(pq_train(emb, m=4, k=k_sub, iters=2))
        assert _rows(coarse) == want_coarse, (k_coarse, k_sub)
        assert _rows(books) == want_books, (k_coarse, k_sub)


def _legacy_ngram_grams(docs, n, text_col="text", id_col="doc_id"):
    """The pre-r12 n-gram occurrence builder: posexplode + per-doc
    ``lead`` window, off-end rows dropped by the null check on the
    furthest lead. Kept as the executable specification for the
    shuffle-free element_at assembly."""
    from pyspark.sql import Window as W

    from shaha_spark.operators.constants import TOKEN_SPLIT_RE

    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("pos", "w"),
    ).filter(F.col("w") != "")
    wnd = W.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(wnd) for i in range(1, n)]
    return (
        toks.select(
            F.col(id_col),
            F.concat_ws(" ", *parts).alias("gram"),
            parts[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select(id_col, "gram")
    )


@pytest.fixture(scope="module")
def ngram_edge_docs(spark):
    """Edge cases the off-end null check used to handle: null text,
    empty text, separator-only text, fewer-than-n tokens, multi-space
    runs, repeated grams."""
    return spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b a b a b"),
            (3, "  leading  and   multi   spaces "),
            (4, "one"),
            (5, "two words"),
            (6, ""),
            (7, None),
            (8, "\t tabs\nand newlines \t"),
        ],
        "doc_id int, text string",
    )


def test_word_ngrams_matches_legacy_lead_window_form(spark, docs, ngram_edge_docs):
    from shaha_spark.operators.terms import word_ngrams

    for frame in (docs, ngram_edge_docs):
        for n in (2, 3, 5):
            got = _rows(word_ngrams(frame, n))
            want = _rows(_legacy_ngram_grams(frame, n).distinct())
            assert got == want, n


def test_ngram_stream_occurrences_match_legacy_lead_window_form(
    spark, docs, ngram_edge_docs
):
    """The occurrence stream (ngram_repetition / bigram_logprob /
    trigram_backoff input) must keep the exact per-document gram
    MULTISET of the window form, not just the distinct set."""
    from shaha_spark.operators.terms import _ngram_stream

    for frame in (docs, ngram_edge_docs):
        for n in (2, 3):
            stream = _ngram_stream(frame, n, "text", "doc_id").select(
                F.col("doc_id"),
                F.concat_ws(" ", *[f"w{j + 1}" for j in range(n)]).alias("gram"),
            )
            got = _rows(stream)
            want = _rows(_legacy_ngram_grams(frame, n))
            assert got == want, n


def _legacy_window_assign(corpus, centroids, vec_col="embedding", id_col="vec_id"):
    """The pre-r12 argmax-assignment: rank-1 window over the scored
    crossJoin (kept as the executable specification for the
    max(struct) aggregate that replaced it)."""
    from pyspark.sql import Window

    from shaha_spark.operators.similarity import (
        cosine_sim_hoisted,
        dot,
        norm2,
    )

    c = F.broadcast(
        centroids.select(
            "centroid_id", "centroid", norm2(F.col("centroid")).alias("__ctn2")
        )
    )
    scored = corpus.withColumn("__vn2", norm2(F.col(vec_col))).crossJoin(
        c
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_sim_hoisted(
            dot(F.col(vec_col), F.col("centroid")),
            F.col("__vn2"),
            F.col("__ctn2"),
        ).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def test_argmax_assign_matches_legacy_window_form(spark):
    """assign_nearest / ivf_assign argmax via max(struct(sim, -cid, …))
    must pick the identical centroid as the legacy rank-1 window for
    every degenerate score ordering: NULL sims (null vector, length
    mismatch), exact ties (duplicated centroid vector → lowest
    centroid_id wins), and the plain max case. (Zero-norm vectors
    raise DIVIDE_BY_ZERO under ANSI mode in BOTH forms — the fold
    path's documented semantics, unchanged by the rewrite.)"""
    from shaha_spark.operators.kmeans import assign_nearest
    from shaha_spark.operators.similarity import ivf_assign

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),        # clear winner
            (2, [0.0, 1.0, 0.0]),        # exact tie between dup centroids
            (3, None),                    # null vector -> all sims NULL
            (4, [1.0, 0.0]),             # length mismatch -> all sims NULL
            (6, [0.6, 0.8, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    cents = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),        # duplicate of 1: tie on sim
            (3, [1.0, 0.0, 0.0]),
        ],
        "centroid_id int, centroid array<double>",
    )
    want = _rows(_legacy_window_assign(corpus, cents))
    assert _rows(assign_nearest(corpus, cents)) == want
    assert _rows(ivf_assign(corpus, cents)) == want


def test_grouped_argmax_and_prototypicality_match_legacy_window_form(spark):
    """kmeans_fit_grouped's per-iteration argmax and prototypicality's
    best-cosine pick must match the legacy window on real data (the
    grouped trajectory is pinned transitively: identical assignment ->
    identical decimal means -> identical next-round centroids)."""
    from shaha_spark.operators.kmeans import (
        kmeans_fit,
        prototypicality,
    )

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_fit(embs, k=4, iters=1)
    legacy = _legacy_window_assign(embs, cents).select(
        "vec_id", "centroid_id"
    )
    got = prototypicality(embs, cents).select("vec_id", "centroid_id")
    assert _rows(got) == _rows(legacy)
