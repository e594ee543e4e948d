"""Property-based tests (hypothesis) for the pure-Python core:
prefix-range rewrite, hex helpers, and the digest kernels."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from shaha_spark.functions.blake3_pure import blake3
from shaha_spark.functions.keccak import keccak256
from shaha_spark.query import prefix_successor
from shaha_spark.schema import hex_to_bytes, prefix_upper_bound


@given(st.binary(min_size=1, max_size=8), st.binary(min_size=0, max_size=40))
def test_prefix_range_equals_startswith(prefix, digest):
    """[p, succ(p)) under bytewise order == 'starts with p', exactly."""
    upper = prefix_successor(prefix)
    in_range = digest >= prefix and (upper is None or digest < upper)
    assert in_range == digest.startswith(prefix)


@given(st.binary(min_size=1, max_size=8))
def test_prefix_successor_is_least_upper_bound(prefix):
    upper = prefix_successor(prefix)
    if upper is not None:
        assert upper > prefix
        # nothing strictly between the largest p-prefixed string of any
        # length L and succ(p): padding with 0xff stays inside
        assert (prefix + b"\xff" * 8) < upper


@given(st.binary(min_size=0, max_size=16), st.integers(min_value=16, max_value=64))
def test_prefix_upper_bound_padding(prefix, digest_len):
    if len(prefix) > digest_len:
        return
    padded = prefix_upper_bound(prefix, digest_len)
    assert len(padded) == digest_len
    assert padded.startswith(prefix)


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=64))
def test_hex_round_trip(s):
    raw = hashlib.sha256(s.encode("utf-8")).digest()
    assert hex_to_bytes(raw.hex()) == raw


@settings(max_examples=30)
@given(st.binary(min_size=0, max_size=300))
def test_keccak_padding_invariants(data):
    digest = keccak256(data)
    assert len(digest) == 32
    # deterministic + collision-resistant sanity: appending a byte changes it
    assert keccak256(data + b"\x00") != digest


@settings(max_examples=30)
@given(st.binary(min_size=0, max_size=3000))
def test_blake3_chunking_consistency(data):
    """Length-extension across the 64-byte-block and 1024-byte-chunk
    boundaries must never collide with the unextended input."""
    digest = blake3(data)
    assert len(digest) == 32
    assert blake3(data + b"x") != digest


@settings(max_examples=20)
@given(st.lists(st.binary(min_size=0, max_size=70), min_size=2, max_size=6))
def test_blake3_concat_vs_parts(parts):
    """Hash of the concatenation must equal one-shot hashing (guards the
    chunk-tree construction against split-position sensitivity)."""
    whole = b"".join(parts)
    assert blake3(whole) == blake3(bytes(whole))


def test_weighted_sample_rate_tracks_weight():
    # driver-side check of the inclusion rule's proportionality using
    # the same md5 bucket the operator computes (no Spark needed)
    import hashlib

    def bucket(key: str, salt: str) -> int:
        return int(hashlib.md5((key + salt).encode()).hexdigest()[:7], 16) % 10_000

    n = 20000
    kept_half = sum(1 for i in range(n) if bucket(str(i), "s") * 100.0 < 50.0 * 10000)
    kept_tenth = sum(1 for i in range(n) if bucket(str(i), "s") * 100.0 < 10.0 * 10000)
    assert abs(kept_half / n - 0.5) < 0.02
    assert abs(kept_tenth / n - 0.1) < 0.02


# ---- full prefix_predicate semantics (not just the range helper) ----

from shaha_spark.query import prefix_predicate  # noqa: E402
from shaha_spark.schema import FULL_HASH_LENGTHS  # noqa: E402


def _predicate_semantics(
    prefix: bytes, digest: bytes, max_digest_len: int | None = None
) -> bool:
    """Pure-Python mirror of prefix_predicate's branches (empty → all;
    provably-exact full length → equality; else → half-open range)."""
    if len(prefix) == 0:
        return True
    if (
        len(prefix) in FULL_HASH_LENGTHS
        and max_digest_len is not None
        and len(prefix) >= max_digest_len
    ):
        return digest == prefix
    upper = prefix_successor(prefix)
    return digest >= prefix and (upper is None or digest < upper)


@given(
    st.sampled_from(sorted(FULL_HASH_LENGTHS)),
    st.data(),
)
def test_prefix_predicate_equals_startswith_all_branches(digest_len, data):
    digest = data.draw(st.binary(min_size=digest_len, max_size=digest_len))
    prefix_len = data.draw(st.integers(min_value=0, max_value=digest_len))
    # bias: half the time the prefix IS a prefix of the digest, so the
    # positive branch is exercised, not just near-certain negatives
    if data.draw(st.booleans()):
        prefix = digest[:prefix_len]
    else:
        prefix = data.draw(st.binary(min_size=prefix_len, max_size=prefix_len))
    # default (no digest-length knowledge): always exactly startswith —
    # including full-length prefixes against LONGER digests, the case
    # the reference's startswith row filter covers (ref parquet.rs:547)
    assert _predicate_semantics(prefix, digest) == digest.startswith(prefix)
    # with digest-length knowledge the equality upgrade stays exact
    assert (
        _predicate_semantics(prefix, digest, max_digest_len=digest_len)
        == digest.startswith(prefix)
    )


def test_prefix_predicate_column_matches_startswith_spark(spark):
    """Evaluate the actual Column predicate in Spark against startswith
    over random digests/prefixes — locks the JVM bytewise binary
    comparison to Python's, covering all three predicate branches."""
    import random

    rng = random.Random(20260813)
    digests = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(200)]
    prefixes = (
        [b""]
        + [d[:n] for d in digests[:10] for n in (1, 3, 7, 31, 32)]
        + [bytes(rng.randrange(256) for _ in range(n)) for n in (1, 2, 4, 32) for _ in range(5)]
        + [b"\xff", b"\xff\xff", digests[0][:31] + b"\xff"]
    )
    df = spark.createDataFrame([(d,) for d in digests], ["hash"])
    import pyspark.sql.functions as F

    exprs = [
        F.sum(prefix_predicate(p).cast("int")).alias(f"p{i}")
        for i, p in enumerate(prefixes)
    ]
    counts = df.agg(*exprs).collect()[0]
    for i, p in enumerate(prefixes):
        expected = sum(1 for d in digests if d.startswith(p))
        assert counts[f"p{i}"] == expected, (i, p.hex())
