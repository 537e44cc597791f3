"""Resource-monitor log analytics — tile_processor/recorder.py:75-133 as
DataFrame ops.

The reference appends a TSV row per sample: ``(timestamp, tile, pid,
cpu_time_user, cpu_time_sys, mem_rss)`` (worker.py:724-736), then loads
it with pandas for per-tile plots. Same TSV layout here, Spark reader,
same derived columns: cpu_time_total = user+sys (s→min), mem_rss
bytes→MB (recorder.py:96-101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONITOR_SCHEMA = (
    "timestamp timestamp, tile string, pid long, "
    "cpu_time_user double, cpu_time_sys double, mem_rss long"
)


def parse_log(spark: SparkSession, path: str) -> DataFrame:
    """recorder.parse_log (recorder.py:75-103): TSV → typed DataFrame with
    derived total-CPU (minutes) and RSS (MB) columns."""
    df = spark.read.option("sep", "\t").schema(MONITOR_SCHEMA).csv(path)
    return (
        df.withColumn("cpu_time_total", (F.col("cpu_time_user") + F.col("cpu_time_sys")) / 60.0)
        .withColumn("mem_rss_mb", F.col("mem_rss") / F.lit(1024.0 * 1024.0))
    )


def per_tile_summary(log_df: DataFrame) -> DataFrame:
    """recorder.save_cpu_log / save_mem_plot aggregates (recorder.py:106-133):
    per-tile max total CPU minutes, peak RSS MB, sample count, wall span."""
    return log_df.groupBy("tile").agg(
        F.max("cpu_time_total").alias("max_cpu_min"),
        F.max("mem_rss_mb").alias("peak_rss_mb"),
        F.count(F.lit(1)).alias("n_samples"),
        (
            (F.unix_micros(F.max("timestamp")) - F.unix_micros(F.min("timestamp"))) / 6.0e7
        ).alias("wall_min"),
    )
