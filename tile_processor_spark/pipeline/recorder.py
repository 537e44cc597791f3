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


def _polyline_svg(series: list[tuple[str, list[float]]], title: str, unit: str) -> str:
    """Dependency-free SVG line chart (one polyline per tile)."""
    w, h, pad = 640, 320, 40
    allv = [v for _, vs in series for v in vs] or [0.0]
    vmax = max(allv) or 1.0
    nmax = max((len(vs) for _, vs in series), default=1)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}">',
        f'<text x="{w // 2}" y="16" text-anchor="middle" font-size="13">{title}</text>',
        f'<text x="12" y="{h // 2}" font-size="10" transform="rotate(-90 12 {h // 2})" '
        f'text-anchor="middle">{unit}</text>',
        f'<line x1="{pad}" y1="{h - pad}" x2="{w - 10}" y2="{h - pad}" stroke="black"/>',
        f'<line x1="{pad}" y1="{h - pad}" x2="{pad}" y2="20" stroke="black"/>',
    ]
    for k, (tile, vs) in enumerate(series):
        hue = (k * 67) % 360
        pts = " ".join(
            f"{pad + (w - pad - 10) * i / max(nmax - 1, 1):.1f},"
            f"{h - pad - (h - pad - 20) * v / vmax:.1f}"
            for i, v in enumerate(vs)
        )
        parts.append(
            f'<polyline fill="none" stroke="hsl({hue},60%,40%)" points="{pts}"/>'
        )
        parts.append(
            f'<text x="{w - 140}" y="{30 + 14 * k}" font-size="11" '
            f'fill="hsl({hue},60%,40%)">{tile}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def save_monitor_plots(log_df: DataFrame, out_dir: str) -> list[str]:
    """S13 plot sink (reference recorder.save_mem_plot / save_cpu_log,
    recorder.py:106-133) with a format swap: per-tile memory and CPU time
    series rendered as dependency-free SVG (matplotlib PDFs in the
    reference; this container has no matplotlib, and SVG keeps the sink
    pure-python). The time-series collect is driver-side by design —
    monitor logs are sample-rate-bounded, not data-scale-bounded."""
    import os

    rows = log_df.orderBy("tile", "timestamp").select(
        "tile", "mem_rss_mb", "cpu_time_total"
    ).collect()
    mem: dict[str, list[float]] = {}
    cpu: dict[str, list[float]] = {}
    for r in rows:
        mem.setdefault(r.tile, []).append(float(r.mem_rss_mb))
        cpu.setdefault(r.tile, []).append(float(r.cpu_time_total))
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, data, unit in (
        ("memory_usage.svg", mem, "RSS [MB]"),
        ("cpu_time.svg", cpu, "CPU total [min]"),
    ):
        path = os.path.join(out_dir, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(_polyline_svg(sorted(data.items()), name.split(".")[0], unit))
        written.append(path)
    return written
