"""Skew mitigation — explicit salting for joins whose hot keys AQE can't
fully split (SURVEY §4 load-balancing row; the reference's answer was a
random shuffle of the tile list, tileconfig.py:139-140).

AQE skew-join handles most cases at runtime; use an explicit salted join
when the skew is *known* (a handful of mega-tiles, a null-heavy foreign
key) and the right side is small enough to replicate ``salt`` times but
too big to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Join a skewed ``large`` side to ``small`` on ``on``, spreading each
    hot key over ``salt`` shuffle partitions.

    The large side gets a per-row salt in [0, salt); the small side is
    replicated ``salt`` times; the join key becomes (on..., salt). Result
    equals ``large.join(small, on, how)`` for inner/left joins. rand(seed)
    is deterministic per partition, so task retries recompute the same
    salt (safe under speculative execution).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    l_ = large.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    s_ = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_.join(s_, [*on, "_salt"], how).drop("_salt")
