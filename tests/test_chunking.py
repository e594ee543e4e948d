"""chunk_documents / pack_sequences vs straightforward Python models."""

import pytest
from pyspark.sql import functions as F

from shaha_spark.operators.chunking import chunk_documents, pack_sequences


def _model_chunks(text, chunk, overlap):
    toks = [t for t in text.split(" ") if t]
    stride = chunk - overlap
    out = {}
    s = 0
    while s * stride < len(toks):
        piece = toks[s * stride : s * stride + chunk]
        # a window after the first that adds no token beyond the
        # previous window's end is a strict subset — never emitted
        # (round 4: it was, duplicating training text)
        if s > 0 and len(piece) <= overlap:
            break
        out[s] = (len(piece), " ".join(piece))
        s += 1
    return out


def test_chunk_documents_matches_python_model(spark):
    docs = [
        (1, " ".join(f"t{i}" for i in range(75))),
        (2, " ".join(f"u{i}" for i in range(32))),   # exactly one chunk
        (3, " ".join(f"v{i}" for i in range(33))),   # one full + 9-token tail
        (4, "a b c"),                                 # shorter than a chunk
        (5, ""),                                      # no tokens -> no chunks
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk=32, overlap=8).collect()
    }
    expect = {}
    for did, text in docs:
        for cid, v in _model_chunks(text, 32, 8).items():
            expect[(did, cid)] = v
    assert got == expect


def test_chunk_documents_overlap_is_shared_suffix_prefix(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40)))], "doc_id bigint, text string"
    )
    rows = {
        r["chunk_id"]: r["chunk_text"].split(" ")
        for r in chunk_documents(df, chunk=32, overlap=8).collect()
    }
    assert rows[0][-8:] == rows[1][:8]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk=8, overlap=8)


def test_pack_sequences_matches_running_sum(spark):
    docs = [(i, " ".join("w" * 1 for _ in range(cnt)))
            for i, cnt in enumerate([100, 200, 30, 250, 5, 256, 1])]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["bin_id"], r["offset_in_bin"])
        for r in pack_sequences(df, capacity=256).collect()
    )
    start = 0
    expect = []
    for i, cnt in enumerate([100, 200, 30, 250, 5, 256, 1]):
        expect.append((i, cnt, start // 256, start % 256))
        start += cnt
    assert got == expect


def test_pack_sequences_block_size_invariant(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a "), F.repeat(F.lit("b "), (F.col("id") % 37).cast("int"))).alias("text"),
    )
    a = sorted(tuple(r) for r in pack_sequences(df, capacity=64, block=7).collect())
    b = sorted(tuple(r) for r in pack_sequences(df, capacity=64, block=1024).collect())
    assert a == b
