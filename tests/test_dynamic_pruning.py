"""Dynamic partition pruning evidence: when the fact table is
partitioned on the join key and the dimension side is selectively
filtered, Catalyst injects a runtime `dynamicpruning` subquery into the
fact scan — the scan reads only the partitions the dim rows name.

This is THE mechanism that makes star-join queries at 100 TB read
gigabytes instead of everything; the test pins that the engine's
session confs don't disable it and that our partitioned-write layout
(`pipeline/output.py` / plain partitionBy) actually triggers it."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_dpp_subquery_in_fact_scan(spark, tmp_path):
    fact_path = str(tmp_path / "orders_by_priority")
    o = load_table(spark, "orders", SF)
    o.write.partitionBy("o_orderpriority").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    # selective dim: one priority value
    dim = (
        o.select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").startswith("1-"))
        .withColumnRenamed("o_orderpriority", "p")
    )
    joined = fact.join(dim, fact["o_orderpriority"] == dim["p"]).groupBy("p").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    rows = {r.p: r.n for r in joined.collect()}
    want = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r.o_orderpriority.startswith("1-")
    }
    assert rows == want and len(rows) == 1
