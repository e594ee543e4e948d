"""Hash expression registry — the engine's core scalar-function surface.

Mirrors the reference's ``Hasher`` trait + name dispatcher
(ref /root/reference/src/hasher/mod.rs:7-10, 77-108) as a dict of
Column builders. Six of nine algorithms compile to pure JVM built-in
compositions (whole-stage-codegen fast path); keccak256 / ripemd160 /
blake3 / hash160 fall back to Arrow-batched pandas UDFs because Spark
has no built-in kernel for them.

Every builder takes a string-or-binary Column and returns a
``BinaryType`` Column holding the raw digest bytes (the reference
stores raw bytes, not hex — ref src/storage/parquet.rs:75).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BinaryType

from shaha_spark.functions.blake3_pure import blake3_batch as _blake3_batch
from shaha_spark.functions.keccak import keccak256_batch as _keccak256_batch
from shaha_spark.schema import DIGEST_LENGTHS


def _to_bytes(value: object) -> bytes | None:
    # NULL propagates: the JVM-native algorithms (md5/sha2/...) return
    # NULL for NULL input, and the UDF lane must agree — str(None)
    # would fabricate the digest of the literal string "None"
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    return str(value).encode("utf-8")


def _null_safe_batch(
    kernel: Callable[[list[bytes]], list[bytes]], s: pd.Series
) -> pd.Series:
    """Run a list[bytes]→list[bytes] kernel over an Arrow batch,
    passing NULL rows through untouched."""
    datas = [_to_bytes(v) for v in s]
    idx = [i for i, d in enumerate(datas) if d is not None]
    out: list[bytes | None] = [None] * len(datas)
    if idx:
        for i, d in zip(idx, kernel([datas[i] for i in idx])):
            out[i] = d
    return pd.Series(out, index=s.index, dtype=object)


@pandas_udf(BinaryType())
def _ripemd160_udf(s: pd.Series) -> pd.Series:
    # hashlib's ripemd160 is a C kernel; per-row map is already cheap
    return s.map(
        lambda v: None
        if (b := _to_bytes(v)) is None
        else hashlib.new("ripemd160", b).digest()
    )


#: resolved lazily PER WORKER PROCESS (None = not yet probed), same
#: discipline as _BLAKE3_KERNEL below: the native wheel may exist on
#: executors but not the driver or vice versa.
_KECCAK_KERNEL: Callable[[list[bytes]], list[bytes]] | None = None


def _keccak256_digests(datas: list[bytes]) -> list[bytes]:
    """Batch Keccak-256 with a pluggable native fast path: pycryptodome's
    C kernel when importable (``Crypto.Hash.keccak`` with
    ``digest_bits=256`` is the original pre-NIST padding this engine
    needs — NOT hashlib's sha3_256), else the lane-batched pure
    implementation. Both are verified against the same public
    known-answer vectors (ref tests/integration.rs:33-40)."""
    global _KECCAK_KERNEL
    if _KECCAK_KERNEL is None:
        try:
            from Crypto.Hash import keccak as native  # type: ignore[import-not-found]

            _KECCAK_KERNEL = lambda ds: [
                native.new(digest_bits=256, data=d).digest() for d in ds
            ]
        except ImportError:
            _KECCAK_KERNEL = _keccak256_batch
    return _KECCAK_KERNEL(datas)


@pandas_udf(BinaryType())
def _keccak256_udf(s: pd.Series) -> pd.Series:
    # numpy-vectorized over the Arrow batch (~70x the scalar sponge),
    # or pycryptodome's C kernel when present (see _keccak256_digests)
    return _null_safe_batch(_keccak256_digests, s)


#: resolved lazily PER WORKER PROCESS (None = not yet probed): the
#: native wheel may exist on executors but not the driver or vice
#: versa, so the probe must run where the UDF runs.
_BLAKE3_KERNEL: Callable[[list[bytes]], list[bytes]] | None = None


def _blake3_digests(datas: list[bytes]) -> list[bytes]:
    """Batch BLAKE3 with a pluggable native fast path: the ``blake3``
    wheel (Rust kernel, ~GB/s) when importable, else the numpy-batched
    pure-Python kernel. Both produce identical spec-vector-tested
    digests; the pure kernel keeps the engine dependency-free."""
    global _BLAKE3_KERNEL
    if _BLAKE3_KERNEL is None:
        try:
            from blake3 import blake3 as native  # type: ignore[import-not-found]

            _BLAKE3_KERNEL = lambda ds: [native(d).digest() for d in ds]
        except ImportError:
            _BLAKE3_KERNEL = _blake3_batch
    return _BLAKE3_KERNEL(datas)


@pandas_udf(BinaryType())
def _blake3_udf(s: pd.Series) -> pd.Series:
    # numpy-vectorized over the Arrow batch (~300x the scalar tree),
    # or the native wheel when present (see _blake3_digests)
    return _null_safe_batch(_blake3_digests, s)


def _md5(col: Column) -> Column:
    return F.unhex(F.md5(col))


def _sha1(col: Column) -> Column:
    return F.unhex(F.sha1(col))


def _sha256(col: Column) -> Column:
    return F.unhex(F.sha2(col, 256))


def _sha512(col: Column) -> Column:
    return F.unhex(F.sha2(col, 512))


def _hash256(col: Column) -> Column:
    # SHA256(SHA256(x)) — Bitcoin txid style (ref src/hasher/mod.rs:63-75).
    return F.unhex(F.sha2(F.unhex(F.sha2(col, 256)), 256))


def _ripemd160(col: Column) -> Column:
    return _ripemd160_udf(col)


def _hash160(col: Column) -> Column:
    # RIPEMD160(SHA256(x)) — Bitcoin address style (ref src/hasher/mod.rs:50-61).
    # Inner SHA256 stays JVM-side; only the RIPEMD160 hop crosses to Arrow.
    return _ripemd160_udf(F.unhex(F.sha2(col, 256)))


def _keccak256(col: Column) -> Column:
    return _keccak256_udf(col)


def _blake3(col: Column) -> Column:
    return _blake3_udf(col)


#: name -> Column builder; registration order mirrors the reference's
#: ``available_algorithms`` (ref src/hasher/mod.rs:92-104).
HASHERS: dict[str, Callable[[Column], Column]] = {
    "md5": _md5,
    "sha1": _sha1,
    "sha256": _sha256,
    "sha512": _sha512,
    "keccak256": _keccak256,
    "ripemd160": _ripemd160,
    "blake3": _blake3,
    "hash160": _hash160,
    "hash256": _hash256,
}

#: Algorithms whose entire expression runs in the JVM (codegen fast path).
JVM_NATIVE = frozenset({"md5", "sha1", "sha256", "sha512", "hash256"})


def available_algorithms() -> list[str]:
    """Registry listing (ref src/hasher/mod.rs:92-104)."""
    return list(HASHERS)


def get_hasher(name: str) -> Callable[[Column], Column] | None:
    """Name dispatch; None for unknown names (ref src/hasher/mod.rs:77-90)."""
    return HASHERS.get(name)


def resolve_hashers(names: list[str]) -> dict[str, Callable[[Column], Column]]:
    """Validate-and-resolve, erroring like the CLI enum parser
    (ref src/hasher/mod.rs:106-108, src/cli/build.rs:82-90)."""
    out: dict[str, Callable[[Column], Column]] = {}
    for name in names:
        builder = HASHERS.get(name)
        if builder is None:
            raise ValueError(
                f"unknown algorithm {name!r}; available: {', '.join(HASHERS)}"
            )
        out[name] = builder
    return out


def hash_expr(name: str, col: Column) -> Column:
    """Digest Column for one algorithm applied to ``col``."""
    builder = HASHERS.get(name)
    if builder is None:
        raise ValueError(f"unknown algorithm {name!r}")
    return builder(col)


def digest_length(name: str) -> int:
    return DIGEST_LENGTHS[name]
