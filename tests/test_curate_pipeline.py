"""End-to-end curation pipeline (pipeline/curate.py): behavioral tests
for the composed chain plus plan-shape guards for this round's new
operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from shaha_spark.operators import classifier, sampling, terms
from shaha_spark.pipeline.curate import curate_corpus


@pytest.fixture(scope="module")
def raw(spark):
    boiler = "subscribe to our newsletter today"
    good = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest until the evening light fades away"
    )
    rows = [
        # duplicated boilerplate line + good prose
        Row(doc_id=1, lang="en", text=f"{boiler}\n{good}"),
        Row(doc_id=2, lang="en", text=f"{boiler}\nanother long readable "
            "sentence with enough ordinary words to pass all of the "
            "gopher quality rules in this small corpus for sure today"),
        # exact duplicate pair (after line dedup both reduce to `good`)
        Row(doc_id=3, lang="en", text=good),
        # symbol spam: fails the gopher symbol/alpha rules
        Row(doc_id=4, lang="en", text="$$$ ### @@@ %%% ^^^ &&& *** $$$ "
            "### @@@ %%% ^^^ &&& *** $$$ ### @@@ %%% ^^^ &&& *** !!! ???"),
        # too short: fails the token-count rule
        Row(doc_id=5, lang="fr", text="trop court"),
        # phone-number text to redact
        Row(doc_id=6, lang="en", text="call 5551234 now or visit us and "
            "read the rest of this perfectly normal long sentence with "
            "many plain words that continue for a while before the end"),
        # verbatim copy of doc 1 — exercises the exact-dedup stage
        Row(doc_id=7, lang="en", text=f"{boiler}\n{good}"),
    ]
    return spark.createDataFrame(rows)


def test_curate_corpus_full_chain(spark, raw):
    out = curate_corpus(
        raw,
        patterns={"num": "[0-9]+"},
        min_line_docs=2,
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # spam + too-short fail the quality gate
    assert 4 not in by_id and 5 not in by_id
    # boilerplate line removed everywhere it was duplicated
    assert all("subscribe" not in r.text for r in out)
    # docs 1 and 3 share their prose line, so line dedup scrubs it from
    # BOTH; doc 1 then has nothing left (its other line was boilerplate)
    # and doc 3 empties out — line dedup subsumes exact doc dedup here,
    # exactly the Falcon behavior
    assert 1 not in by_id and 3 not in by_id
    # redaction happened before anything else
    assert 6 in by_id and "5551234" not in by_id[6].text
    assert "<num>" in by_id[6].text
    # schema preserved
    assert set(out[0].asDict()) == {"doc_id", "lang", "text"}


def test_curate_corpus_exact_stage(spark, raw):
    # with line dedup off, the exact-dedup stage resolves duplicate
    # docs on its own: lowest id survives
    out = curate_corpus(raw, line_dedup=False, gopher=False).collect()
    ids = {r.doc_id for r in out}
    assert 7 not in ids, "exact duplicate of doc 1 must lose to it"
    assert {1, 2, 3, 4, 5, 6} <= ids


def test_curate_corpus_stages_toggle(spark, raw):
    # everything off = identity
    out = curate_corpus(
        raw, line_dedup=False, gopher=False, exact=False
    )
    assert out.count() == raw.count()
    assert sorted(out.columns) == sorted(raw.columns)
    # mixture stage alone, alpha=1 budget=N keeps everything
    out2 = curate_corpus(
        raw, line_dedup=False, gopher=False, exact=False, mix_col="lang",
        mix_alpha=1.0,
    )
    assert out2.count() == raw.count()


def test_curate_corpus_is_lazy_single_plan(spark, raw):
    out = curate_corpus(raw, patterns={"num": "[0-9]+"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    # pure JVM end to end — no Python eval anywhere in the chain
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------ plan guards (new ops)

def test_temperature_resample_plan_broadcasts_rates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sampling.temperature_resample(docs, "lang", "doc_id", alpha=0.7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "rate table must broadcast"
    assert "SortMergeJoin" not in plan, "corpus must not shuffle for the join"
    assert "EvalPython" not in plan


def test_remove_dup_spans_plan_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = terms.remove_dup_gram_spans(docs, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_logreg_score_plan_shuffle_free(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i} w{i+1} common") for i in range(20)]
    )
    feats = classifier.hashed_features(df, dim=32).localCheckpoint()
    scored = classifier.logreg_score(feats, [0.1] * 32, 0.0)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # scoring an already-materialized feature table is one projection
    assert "Exchange" not in plan, "scorer must not shuffle"
    assert "EvalPython" not in plan, "scorer must stay JVM-side"
