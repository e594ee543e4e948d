"""Round-3 late additions: SemDeDup, corpus line dedup, DSIR resampling.

Each operator gets a behavioral unit test plus (where the semantics are
SQL-expressible) an inline DuckDB parity check using the same portable
determinism recipe the registry oracles use — these are the round-4
registration candidates listed in ROUND3.md.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from shaha_spark.operators import dedup, sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


# ----------------------------------------------------------- semantic_dedup

def test_semantic_dedup_removes_planted_near_dups(spark, embs):
    # plant two exact copies of existing vectors with higher ids
    base = embs.select("vec_id", "embedding")
    n = base.count()
    copies = (
        base.orderBy("vec_id")
        .limit(2)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    planted = base.unionByName(copies)
    survivors = dedup.semantic_dedup(planted, k=4, iters=2, threshold=0.999999)
    ids = {r.vec_id for r in survivors.collect()}
    # the copies (higher ids) lose to their originals
    assert not any(i >= 1_000_000 for i in ids)
    # only near-identical vectors may be dropped — the two copies for
    # sure, plus any natural exact-dups in the corpus
    assert n - 2 <= len(ids) <= n


def test_semantic_dedup_no_dups_keeps_everything(spark, embs):
    # threshold above any natural similarity: nothing should drop
    # (cosine rounds to 6 decimals, so 1.0 only for exact duplicates;
    # drop natural exact-dups from the corpus first)
    uniq = embs.groupBy("embedding").agg(F.min("vec_id").alias("vec_id"))
    n = uniq.count()
    survivors = dedup.semantic_dedup(uniq, k=4, iters=1, threshold=1.0)
    assert survivors.count() == n


# ----------------------------------------------------- dedup_duplicate_lines

def _line_docs(spark):
    rows = [
        Row(doc_id=1, text="keep one\nboilerplate footer\nunique a"),
        Row(doc_id=2, text="boilerplate footer\nunique b"),
        Row(doc_id=3, text="unique c\nboilerplate footer\nboilerplate footer"),
        Row(doc_id=4, text="boilerplate footer"),
        Row(doc_id=5, text="solo doc entirely unique"),
    ]
    return spark.createDataFrame(rows)


def test_dedup_duplicate_lines_removes_cross_doc_lines(spark):
    out = dedup.dedup_duplicate_lines(_line_docs(spark), min_docs=2)
    got = {r.doc_id: r.text for r in out.collect()}
    # 'boilerplate footer' appears in 4 distinct docs -> removed everywhere,
    # including doc 3's in-doc repeat; doc 4 becomes empty and is dropped
    assert got == {
        1: "keep one\nunique a",
        2: "unique b",
        3: "unique c",
        5: "solo doc entirely unique",
    }


def test_dedup_duplicate_lines_keep_empty_docs(spark):
    out = dedup.dedup_duplicate_lines(
        _line_docs(spark), min_docs=2, drop_empty_docs=False
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[4] == ""
    assert len(got) == 5


def test_dedup_duplicate_lines_in_doc_repeat_not_corpus_dup(spark):
    rows = [
        Row(doc_id=1, text="la\nla\nla"),
        Row(doc_id=2, text="other"),
    ]
    out = dedup.dedup_duplicate_lines(spark.createDataFrame(rows), min_docs=2)
    got = {r.doc_id: r.text for r in out.collect()}
    # 'la' repeats inside doc 1 only -> appears in 1 distinct doc -> kept
    assert got == {1: "la\nla\nla", 2: "other"}


def test_dedup_duplicate_lines_duckdb_parity(spark, docs, sf_dir):
    """Whole-doc texts are single 'lines' here (testdata has no newlines),
    which exercises the degenerate-but-valid case: exact-duplicate texts
    across >=2 docs are scrubbed entirely."""
    out = dedup.dedup_duplicate_lines(docs, min_docs=2).orderBy("doc_id")
    got = [(r.doc_id, r.text) for r in out.collect()]
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH lines AS (
          SELECT doc_id, text AS line
          FROM read_parquet('{sf_dir}/documents.parquet')
        ), dup AS (
          SELECT line FROM (
            SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
          ) WHERE nd >= 2
        )
        SELECT doc_id, line AS text FROM lines
        WHERE line NOT IN (SELECT line FROM dup) AND line <> ''
        ORDER BY doc_id
        """
    ).fetchall()
    assert got == [(int(a), b) for a, b in want]


# ------------------------------------------------------- DSIR resampling

def test_importance_weights_prefer_target_like_docs(spark, docs):
    # target = the English slice; English docs should on average score
    # higher than non-English ones
    target = docs.filter(F.col("lang") == "en")
    w = sampling.importance_weights(docs, target)
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    avg = {
        r.is_en: r.m
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("logweight").alias("m"))
        .collect()
    }
    assert avg[True] > avg[False]


def test_importance_weights_every_doc_scored(spark, docs):
    target = docs.filter(F.col("lang") == "en")
    w = sampling.importance_weights(docs, target)
    # every doc with at least one token gets a row
    n_nonempty = docs.filter(F.trim("text") != "").count()
    assert w.count() == n_nonempty


def test_importance_resample_topk_deterministic(spark, docs):
    target = docs.filter(F.col("lang") == "en")
    a = sampling.importance_resample(docs, target, k=25)
    b = sampling.importance_resample(docs, target, k=25)
    ra = [(r.doc_id, r.logweight) for r in a.collect()]
    rb = [(r.doc_id, r.logweight) for r in b.collect()]
    assert ra == rb
    assert len(ra) == 25
    # nested-prefix property of rank selection: top-10 is a prefix of top-25
    c = sampling.importance_resample(docs, target, k=10)
    assert [(r.doc_id, r.logweight) for r in c.collect()] == ra[:10]


def test_importance_weights_duckdb_parity(spark, docs, sf_dir):
    """Cross-engine check of the full hashed-ngram + rounded-ln recipe —
    the exact SQL shape a round-4 registry oracle will use."""
    target = docs.filter(F.col("lang") == "en")
    got = {
        r.doc_id: (r.n_grams, round(r.logweight, 6))
        for r in sampling.importance_weights(docs, target).collect()
    }
    B = 4096
    grams_cte = """
        toks AS (
          SELECT doc_id, lang, w, pos FROM (
            SELECT doc_id, lang, unnest(ts) AS w,
                   unnest(range(1, len(ts) + 1)) AS pos
            FROM (SELECT doc_id, lang,
                         list_filter(string_split(text, ' '), t -> t <> '') AS ts
                  FROM read_parquet('{p}/documents.parquet'))
          )
        ),
        withnext AS (
          SELECT doc_id, lang, w,
                 lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          FROM toks
        ),
        grams AS (
          SELECT doc_id, lang, w AS gram FROM withnext
          UNION ALL
          SELECT doc_id, lang, concat(w, ' ', w2) AS gram
          FROM withnext WHERE w2 IS NOT NULL
        ),
        bucketed AS (
          SELECT doc_id, lang,
                 CAST(concat('0x', substr(md5(concat(gram, '')), 1, 7)) AS BIGINT)
                   % {B} AS bucket
          FROM grams
        )
    """.format(p=sf_dir, B=B)
    sql = f"""
        WITH {grams_cte},
        cr AS (SELECT bucket, count(*) AS cr FROM bucketed GROUP BY bucket),
        ct AS (SELECT bucket, count(*) AS ct FROM bucketed
               WHERE lang = 'en' GROUP BY bucket),
        tr AS (SELECT sum(cr) AS tr FROM cr),
        tt AS (SELECT coalesce(sum(ct), 0) AS tt FROM ct),
        lam AS (
          SELECT cr.bucket,
                 CAST(round(ln((coalesce(ct.ct, 0) + 1)::DOUBLE
                              / (tt.tt + {B})::DOUBLE), 8) AS DECIMAL(20,8))
               - CAST(round(ln((cr.cr + 1)::DOUBLE
                              / (tr.tr + {B})::DOUBLE), 8) AS DECIMAL(20,8))
                 AS lam
          FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket, tr, tt
        )
        SELECT b.doc_id, count(*) AS n_grams,
               CAST(sum(lam.lam) AS DOUBLE) AS logweight
        FROM bucketed b JOIN lam ON b.bucket = lam.bucket
        GROUP BY b.doc_id
    """
    want = {
        int(d): (int(n), round(lw, 6))
        for d, n, lw in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


# ------------------------------------------------------------ BPE training

def _ref_bpe(word_freqs: dict[str, int], num_merges: int, min_count: int = 2):
    """Independent pure-Python BPE reference (Sennrich-style greedy
    left-to-right merging, ties lexicographic on the pair)."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < min_count:
            break
        merges.append((step, l, r, l + r, cnt))
        for w in syms:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def _word_freqs(docs):
    rows = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    return {r.w: r["count"] for r in rows}


def test_bpe_train_matches_reference(spark, docs):
    from shaha_spark.operators import terms

    got = terms.bpe_train(docs, num_merges=8)
    want, _ = _ref_bpe(_word_freqs(docs), 8)
    assert got == want


def test_bpe_encode_matches_reference(spark, docs):
    from shaha_spark.operators import terms

    merges = terms.bpe_train(docs, num_merges=6)
    enc = terms.bpe_encode(docs, merges)
    _, ref_syms = _ref_bpe(_word_freqs(docs), 6)
    got = {r.term: list(r.pieces) for r in
           enc.select("term", "pieces").distinct().collect()}
    assert got == {w: s for w, s in ref_syms.items()}
    # every occurrence row reassembles to its term
    bad = enc.filter(F.array_join("pieces", "") != F.col("term")).count()
    assert bad == 0


def test_bpe_encode_accepts_bare_pairs(spark):
    from shaha_spark.operators import terms

    d = spark.createDataFrame([Row(doc_id=1, text="banana bandana")])
    enc = terms.bpe_encode(d, [("a", "n"), ("b", "an")])
    got = {r.term: list(r.pieces) for r in enc.collect()}
    assert got == {"banana": ["ban", "an", "a"], "bandana": ["ban", "d", "an", "a"]}


# ------------------------------------------------- product quantization

def test_pq_roundtrip_on_centroid_vectors(spark):
    """If corpus vectors ARE sub-centroid concatenations, PQ scoring is
    EXACT: the top hit for a query equal to a corpus vector is itself
    with approx_cosine == 1."""
    from shaha_spark.operators import pq

    import itertools
    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    rows = [
        Row(vec_id=i, embedding=a + b)
        for i, (a, b) in enumerate(itertools.product(base, base))
    ]
    corpus = spark.createDataFrame(rows)
    books = pq.pq_train(corpus, m=2, k=4, iters=3)
    assert books.count() == 8
    codes = pq.pq_encode(corpus, books)
    queries = corpus.limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq.pq_topk(codes, books, queries, k=3)
    best = {r.query_id: (r.vec_id, r.approx_cosine)
            for r in top.filter("rank = 1").collect()}
    for qid, (vid, cos) in best.items():
        assert vid == qid and cos == 1.0, (qid, vid, cos)


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_pq_recall_vs_brute_force(spark, embs):
    from shaha_spark.operators import pq, similarity

    corpus = embs.select("vec_id", "embedding")
    books = pq.pq_train(corpus, m=16, k=16, iters=2)
    codes = pq.pq_encode(corpus, books)
    queries = corpus.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq.pq_topk(codes, books, queries, k=10)
    exact = similarity.brute_force_topk(corpus, queries, k=10)
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # the sf0.001 embeddings are near-isotropic noise — the hardest
    # case for PQ; recall@10 far above chance (10/500 = 0.02) is the
    # functional bar (measured 0.475 at m=16,k=16)
    assert recall >= 0.4, recall


def test_pq_encode_shuffle_free(spark, embs):
    from shaha_spark.operators import pq

    corpus = embs.select("vec_id", "embedding")
    books = pq.pq_train(corpus, m=4, k=8, iters=1)
    codes = pq.pq_encode(corpus, books)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "pq_encode must be a shuffle-free scan"
    assert "EvalPython" not in plan
    # codes are within range, m per vector
    row = codes.first()
    assert len(row.codes) == 4 and all(1 <= c <= 8 for c in row.codes)


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_ivf_pq_topk_self_match(spark, embs):
    from shaha_spark.operators import kmeans, pq

    corpus = embs.select("vec_id", "embedding")
    coarse = kmeans.kmeans_fit(corpus, k=4, iters=1)
    books = pq.pq_train(corpus, m=16, k=16, iters=1)
    queries = corpus.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq.ivf_pq_topk(corpus, queries, coarse, books, k=5, nprobe=2)
    rows = top.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rs in by_q.items():
        assert len(rs) == 5
        # every query's own vector is in a probed bucket (nprobe=2 and
        # assignment uses the same centroids), so it must appear; with
        # exact self-ADC it ranks first
        top1 = [r for r in rs if r.rank == 1][0]
        assert top1.vec_id == qid, (qid, top1)


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_ivf_pq_subset_of_pq(spark, embs):
    """IVF-PQ results are PQ results restricted to probed buckets: every
    (query, id, score) IVF-PQ returns must carry the same approx_cosine
    the pure-PQ scorer assigns."""
    from shaha_spark.operators import kmeans, pq

    corpus = embs.select("vec_id", "embedding")
    coarse = kmeans.kmeans_fit(corpus, k=4, iters=1)
    books = pq.pq_train(corpus, m=8, k=8, iters=1)
    codes = pq.pq_encode(corpus, books)
    queries = corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = {
        (r.query_id, r.vec_id): r.approx_cosine
        for r in pq.pq_topk(codes, books, queries, k=500).collect()
    }
    ivf = pq.ivf_pq_topk(corpus, queries, coarse, books, k=10, nprobe=2).collect()
    for r in ivf:
        assert full[(r.query_id, r.vec_id)] == r.approx_cosine
