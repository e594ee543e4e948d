"""Randomized differential tests: Spark operators vs independent
pure-Python reimplementations on a seeded synthetic corpus (unicode,
empties, single tokens, duplicates) — guards the operator semantics
beyond the fixed ASCII testdata."""

from __future__ import annotations

import hashlib
import random

import pytest

from shaha_spark.operators.constants import (
    FINGERPRINT_K,
    LANG_STOPWORDS,
    MERSENNE_P,
    MINHASH_PERMS,
)


def h_bits(s: str, digits: int) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:digits], 16)


def py_minhash(text: str) -> list[int]:
    toks = [t for t in text.split(" ") if t]
    sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)] if len(toks) >= 3 else []
    hs = [h_bits(s, 7) for s in sh]
    out = []
    for a, b in MINHASH_PERMS:
        out.append(min(((a * h + b) % MERSENNE_P for h in hs), default=MERSENNE_P))
    return out


def py_simhash(text: str) -> int:
    toks = [t for t in text.split(" ") if t]
    hs = [h_bits(t, 8) for t in toks]
    fp = 0
    for j in range(32):
        s = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if s > 0:
            fp |= 1 << j
    return fp


def py_fingerprint(text: str) -> int:
    toks = [t for t in text.split(" ") if t]
    total = 0
    for pos, tok in enumerate(toks, start=1):
        total = (total + (pos * FINGERPRINT_K % MERSENNE_P) * h_bits(tok, 7) % MERSENNE_P) % MERSENNE_P
    return total


def py_langid(text: str) -> str:
    toks = [t for t in text.split(" ") if t]
    best, best_score = "und", 0
    for lang in sorted(LANG_STOPWORDS):
        score = sum(1 for t in toks if t in LANG_STOPWORDS[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(1234)
    vocab = (
        ["the", "der", "le", "el", "und", "et", "y", "data", "spark", "größe",
         "naïve", "日本語", "café", "x"]
        + [f"w{i}" for i in range(30)]
    )
    rows = []
    for i in range(200):
        n = rng.choice([0, 1, 2, 3, 5, 8, 20, 60])
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows += [(200, ""), (201, "solo"), (202, "a b"), (203, "the " * 50)]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    return df, dict(rows)


def test_minhash_matches_reference(spark, corpus):
    from shaha_spark.operators.dedup import minhash_signatures

    df, texts = corpus
    got = {
        r.doc_id: [r[f"mh_{i}"] for i in range(len(MINHASH_PERMS))]
        for r in minhash_signatures(df).collect()
    }
    for doc_id, text in texts.items():
        assert got[doc_id] == py_minhash(text), doc_id


def test_simhash_matches_reference(spark, corpus):
    from shaha_spark.operators.dedup import simhash

    df, texts = corpus
    got = {r.doc_id: r.simhash for r in simhash(df).collect()}
    for doc_id, text in texts.items():
        assert got[doc_id] == py_simhash(text), doc_id


def test_fingerprint_matches_reference(spark, corpus):
    from shaha_spark.operators.textops import fingerprint

    df, texts = corpus
    got = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    for doc_id, text in texts.items():
        assert got[doc_id] == py_fingerprint(text), doc_id


def test_langid_matches_reference(spark, corpus):
    from shaha_spark.operators.textops import lang_id

    df, texts = corpus
    got = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    for doc_id, text in texts.items():
        assert got[doc_id] == py_langid(text), (doc_id, text)


def test_quality_matches_reference(spark, corpus):
    from shaha_spark.operators.constants import QUALITY_STOPWORDS
    from shaha_spark.operators.textops import quality_score

    df, texts = corpus
    got = {r.doc_id: r for r in quality_score(df).collect()}
    for doc_id, text in texts.items():
        toks = [t for t in text.split(" ") if t]
        row = got[doc_id]
        assert row.n_chars == len(text)
        assert row.n_tokens == len(toks)
        if toks:
            assert row.mean_token_len == pytest.approx(
                sum(len(t) for t in toks) / len(toks), abs=0
            )
            assert row.stopword_ratio == sum(
                1 for t in toks if t in QUALITY_STOPWORDS
            ) / len(toks)
        else:
            assert row.mean_token_len == 0.0 and row.stopword_ratio == 0.0
