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


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_page(content: str, w: int = 612, h: int = 396) -> bytes:
    """Wrap a PDF content stream in a minimal single-page document
    (valid PDF 1.4: catalog, page tree, Helvetica, xref with correct
    byte offsets). ~40 lines replaces the matplotlib dependency the
    reference uses for the same two charts."""
    # PDF string objects are latin-1; tile ids outside it degrade to '?'
    # rather than failing the sink.
    stream = content.encode("latin-1", errors="replace")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        ).encode(),
        b"<< /Length "
        + str(len(stream)).encode()
        + b" >>\nstream\n"
        + stream
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _chart_frame(title: str, unit: str, w: int = 612, h: int = 396) -> list[str]:
    """Axes + title + rotated y-label as PDF content-stream ops."""
    pad = 50
    return [
        "0 0 0 RG 1 w",
        f"{pad} {pad} m {w - 20} {pad} l S",
        f"{pad} {pad} m {pad} {h - 30} l S",
        f"BT /F1 12 Tf {w // 2 - 4 * len(title)} {h - 18} Td ({_pdf_escape(title)}) Tj ET",
        # rotated 90° y-axis label: text matrix [0 1 -1 0 x y]
        f"BT /F1 9 Tf 0 1 -1 0 16 {h // 2 - 4 * len(unit) // 2} Tm ({_pdf_escape(unit)}) Tj ET",
    ]


def _color(k: int) -> str:
    palette = [(0.2, 0.4, 0.8), (0.8, 0.3, 0.2), (0.2, 0.6, 0.3), (0.6, 0.2, 0.6), (0.7, 0.5, 0.1)]
    r, g, b = palette[k % len(palette)]
    return f"{r} {g} {b}"


def _polyline_pdf(series: list[tuple[str, list[float]]], title: str, unit: str) -> bytes:
    """Per-tile line chart as PDF (reference save_mem_plot parity)."""
    w, h, pad = 612, 396, 50
    ops = _chart_frame(title, unit, w, h)
    allv = [v for _, vs in series for v in vs] or [0.0]
    vmax = max(allv) or 1.0
    nmax = max((len(vs) for _, vs in series), default=1)
    for k, (tile, vs) in enumerate(series):
        ops.append(f"{_color(k)} RG 1.5 w")
        for i, v in enumerate(vs):
            x = pad + (w - pad - 30) * i / max(nmax - 1, 1)
            y = pad + (h - pad - 50) * v / vmax
            ops.append(f"{x:.1f} {y:.1f} {'m' if i == 0 else 'l'}")
        ops.append("S")
        ops.append(f"{_color(k)} rg")
        ops.append(
            f"BT /F1 10 Tf {w - 110} {h - 50 - 14 * k} Td ({_pdf_escape(tile)}) Tj ET"
        )
    return _pdf_page("\n".join(ops), w, h)


def _bar_pdf(bars: list[tuple[str, float]], title: str, unit: str) -> bytes:
    """Per-tile bar chart as PDF (reference save_cpu_log parity: one bar
    per tile, height = max CPU minutes)."""
    w, h, pad = 612, 396, 50
    ops = _chart_frame(title, unit, w, h)
    vmax = max((v for _, v in bars), default=1.0) or 1.0
    n = max(len(bars), 1)
    slot = (w - pad - 30) / n
    for k, (tile, v) in enumerate(bars):
        x = pad + slot * k + slot * 0.15
        bh = (h - pad - 50) * v / vmax
        ops.append(f"{_color(k)} rg {x:.1f} {pad} {slot * 0.7:.1f} {bh:.1f} re f")
        ops.append("0 0 0 rg")
        ops.append(
            f"BT /F1 8 Tf {x:.1f} {pad - 12} Td ({_pdf_escape(tile)}) Tj ET"
        )
    return _pdf_page("\n".join(ops), w, h)


def save_monitor_plots(log_df: DataFrame, out_dir: str) -> list[str]:
    """S13 plot sink — full reference parity (recorder.save_mem_plot /
    save_cpu_log, recorder.py:106-133): per-tile memory line plot and
    max-CPU bar chart as PDF, written by a minimal built-in PDF writer
    (no matplotlib in this environment), plus the same charts as SVG.
    The time-series collect is driver-side by design — monitor logs are
    sample-rate-bounded, not data-scale-bounded."""
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
    mem_pdf = os.path.join(out_dir, "memory_usage.pdf")
    with open(mem_pdf, "wb") as f:
        f.write(_polyline_pdf(sorted(mem.items()), "Memory usage per tile", "RSS [MB]"))
    written.append(mem_pdf)
    cpu_bars = [(tile, max(vs)) for tile, vs in sorted(cpu.items())]
    cpu_pdf = os.path.join(out_dir, "cpu_time.pdf")
    with open(cpu_pdf, "wb") as f:
        f.write(_bar_pdf(cpu_bars, "CPU time per tile", "CPU time (User+Sys) [minutes]"))
    written.append(cpu_pdf)
    return written
