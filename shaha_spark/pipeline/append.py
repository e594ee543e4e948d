"""Append-merge: the engine's only join-shaped operator (J1).

Semantics (ref /root/reference/src/cli/build.rs:180-204): records are
keyed by (hash, algorithm); when an incoming record collides with an
existing one, the EXISTING preimage is kept and the incoming sources
are appended to the existing list, skipping duplicates, preserving
order (existing first). Non-colliding records pass through.

That is a full-outer equi-join with `coalesce(existing, new)` on
preimage and ordered `array_union` on sources. Catalyst picks the
physical join; on typical appends (small new batch vs. huge DB) AQE
converts it to a broadcast join of the new side automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_merge(existing: DataFrame, new: DataFrame) -> DataFrame:
    e = existing.alias("e")
    n = new.alias("n")
    empty = F.array().cast("array<string>")
    return (
        e.join(n, on=["hash", "algorithm"], how="full_outer")
        .select(
            F.col("hash"),
            # existing-wins preimage (ref build.rs:188-196 keeps the
            # already-stored record and only touches its sources)
            F.coalesce(F.col("e.preimage"), F.col("n.preimage")).alias("preimage"),
            F.col("algorithm"),
            # array_union keeps left order then appends unseen right
            # elements in order — exactly the contains-then-push loop at
            # ref build.rs:189-194.
            F.array_union(
                F.coalesce(F.col("e.sources"), empty),
                F.coalesce(F.col("n.sources"), empty),
            ).alias("sources"),
        )
        .select("hash", "preimage", "algorithm", "sources")
    )
