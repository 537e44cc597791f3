"""Plan-shape pins for the round-6 distributed-rank rewrites: the
RFM / Pareto queries must never order a fact-grain frame on a single
partition — every unpartitioned Window in their physical plans may
operate only over the tiny band series (ordered by ``_band``), and the
band-partitioned local windows must exist. Values stay pinned by the
unchanged DuckDB oracles (gate window slots 2-3 this round)."""

from __future__ import annotations

import re

from tile_processor_spark.plans.relational_ext5 import (
    customer_rfm_segments,
    pareto_abc_parts,
)

SF = "/root/testdata/sf0.001"


def _top_level_groups(s: str) -> list[str]:
    """Top-level [...] bracket groups of one plan line."""
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _window_lines(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        line.split("Window ", 1)[1]
        for line in plan.splitlines()
        if re.search(r"\bWindow \[", line)
    ]


def _assert_unpartitioned_windows_are_band_grain(df) -> None:
    lines = _window_lines(df)
    assert lines, "expected Window nodes in the plan"
    saw_band_partitioned = False
    for line in lines:
        groups = _top_level_groups(line)
        # Window prints [exprs], [partitionSpec], [orderSpec]; an
        # unpartitioned window collapses to two top-level groups.
        assert len(groups) in (2, 3), f"unexpected Window shape: {line[:200]}"
        if len(groups) == 3:
            if "_band" in groups[1]:
                saw_band_partitioned = True
            continue
        # unpartitioned: the ordering must be the band series only
        order = groups[1]
        assert order.strip().startswith("_band"), (
            "fact-grain single-partition window found: " + line[:200]
        )
    assert saw_band_partitioned, "expected a _band-partitioned local window"


def test_rfm_has_no_fact_grain_global_window(spark):
    _assert_unpartitioned_windows_are_band_grain(customer_rfm_segments(spark, SF))


def test_pareto_has_no_fact_grain_global_window(spark):
    _assert_unpartitioned_windows_are_band_grain(pareto_abc_parts(spark, SF))


def test_rfm_buckets_match_ntile_semantics(spark):
    # cross-check the rank-arithmetic bucketing against Spark's own
    # NTILE on the same base frame (small data; the oracle gate pins the
    # same equality against DuckDB at sf0.01).
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    df = customer_rfm_segments(spark, SF)
    expected = df.select(
        "custkey",
        F.ntile(5)
        .over(W.orderBy(F.desc("recency_days"), "custkey"))
        .cast("long")
        .alias("r_exp"),
        F.ntile(5).over(W.orderBy("frequency", "custkey")).cast("long").alias("f_exp"),
        F.ntile(5).over(W.orderBy("monetary", "custkey")).cast("long").alias("m_exp"),
    )
    joined = df.join(expected, "custkey")
    bad = joined.filter(
        (F.col("r") != F.col("r_exp"))
        | (F.col("f") != F.col("f_exp"))
        | (F.col("m") != F.col("m_exp"))
    )
    assert bad.count() == 0


def test_pareto_classes_partition_all_parts(spark):
    import pyspark.sql.functions as F

    df = pareto_abc_parts(spark, SF)
    rows = df.groupBy("abc_class").count().collect()
    classes = {r["abc_class"] for r in rows}
    assert classes <= {"A", "B", "C"} and "A" in classes
    # rk is a permutation of 1..n (global rank reassembled correctly)
    n = df.count()
    agg = df.agg(
        F.min("rk").alias("lo"), F.max("rk").alias("hi"),
        F.countDistinct("rk").alias("d"),
    ).collect()[0]
    assert (agg["lo"], agg["hi"], agg["d"]) == (1, n, n)
