"""Halo-chunked trailing-row windows: exact sliding-frame computation
whose parallelism scales with DATA VOLUME, not with the cardinality of
the partition key.

The hazard this solves (measured, docs/SCALE.md §sf10): a window like

    W.partitionBy("event_type").orderBy(...).rowsBetween(-50, 0)

is "partitioned", but ``event_type`` has 5 values — so the whole fact
stream funnels through 5 tasks, and a 10× data step costs ~10× wall
regardless of cluster size (events_rolling_median measured 13.7× on
the sf1 → sf10 rehearsal step). The plan LOOKS scale-safe (no global
window) while behaving like a single-partition sort per key.

The fix is the standard halo (ghost-cell) exchange, all in DataFrame
operators:

1. **Banded global row index** per key: local ``row_number`` within
   (key, time-cell) partitions + exclusive cumulative cell counts per
   key (a window over the per-key CELL SERIES — bounded by the
   calendar, shuffled per key, never the fact grain) → a dense global
   index ``r`` per key, without any low-parallelism fact-grain window.
2. **Chunk** rows by ``r div chunk_rows``; copy the last ``window``
   rows of every chunk to the NEXT chunk as flagged halo rows (each
   row is duplicated at most once).
3. Run the trailing frame within (key, chunk) — thousands of
   independent partitions — and keep only non-halo outputs. Frames of
   kept rows are exactly the global frames: a kept row needs at most
   ``window`` predecessors, and those are present by construction
   (same chunk, or its halo prefix).

Exactness requires only that ``order_cols`` are a total order per key
(include a tiebreaker id). Results are value-identical to the naive
per-key window — the rewritten queries keep their DuckDB oracles
unchanged, which is the correctness gate for the pattern.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

#: rows per chunk — sized so a task sorts a few thousand rows: small
#: enough for thousands-way parallelism at 100 TB, large enough that
#: the per-chunk halo duplication (window/chunk_rows) is noise.
CHUNK_ROWS = 8192

#: size-dispatch threshold for :func:`banded_topk`: when the caller can
#: bound the input under this many rows, the naive per-key rank window
#: (one scan, one shuffle, single sort task per key) beats the banded
#: plan's two scans of an expensive upstream. 1M short rows sort in
#: well under a second on one task, so the funnel is harmless below it.
NAIVE_TOPK_ROWS = 1_000_000

DAY_US = 86_400_000_000


def _check_collisions(df: DataFrame, names: Sequence[str], where: str) -> None:
    """Fail loudly when a helper's temp/output column name already exists
    on the input frame — ``withColumn`` would silently overwrite it and
    the trailing ``drop`` would then destroy the caller's column."""
    bad = [n for n in names if n in df.columns]
    if bad:
        raise ValueError(
            f"{where}: column name(s) {bad} collide with input columns — "
            "they would be silently overwritten and dropped"
        )


#: max chained halo copies per side: a frame ``width`` needs
#: ``ceil(width / chunk_rows)`` neighbor-chunk copies of each row, so
#: the replication factor grows linearly with width ÷ chunk size.
#: Past this the caller should raise ``chunk_rows`` (fewer, larger
#: chunks) instead of paying ~9×+ row duplication through the union.
MAX_HALO_CHAIN = 8


def _halo_copies(width: int, what: str, chunk_rows: int) -> int:
    """Chained-halo copy count for a frame side of ``width`` rows:
    chunk c needs rows from chunks c−1 … c−ceil(width/chunk_rows), so
    each row replicates into up to that many later (or earlier) chunks.
    Frames wider than a chunk are supported by this chaining (round-10
    extension of the old single-copy halo, which rejected them);
    widths needing more than :data:`MAX_HALO_CHAIN` copies still raise
    — the duplication cost is then the dominant term and raising
    ``chunk_rows`` is the right fix, not a deeper chain."""
    copies = -(-width // chunk_rows) if width > 0 else 0
    if copies > MAX_HALO_CHAIN:
        raise ValueError(
            f"{what}={width} needs {copies} chained halo copies at "
            f"chunk_rows={chunk_rows} (cap {MAX_HALO_CHAIN}): every row "
            "would replicate that many times through the halo union — "
            "raise chunk_rows so the frame spans fewer chunks"
        )
    return copies


def banded_row_index(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
) -> DataFrame:
    """Add a dense per-key global row index ``r`` (1-based, ordered by
    ``order_cols``) using the two-pass banded discipline: local ranks
    within (key, cell), plus broadcast exclusive per-cell offsets. The
    only cross-cell window runs on the per-key cell series (calendar-
    bounded), so no fact-grain data ever funnels through few tasks.
    ``cell`` must be a monotone coarsening of the first order column."""
    _check_collisions(df, ["_cell", "_lrk", "_off", "r"], "banded_row_index")
    keys = list(key_cols)
    order = list(order_cols)
    b = df.withColumn("_cell", cell)
    wloc = W.partitionBy(*keys, "_cell").orderBy(*order)
    local = b.withColumn("_lrk", F.row_number().over(wloc))
    counts = b.groupBy(*keys, "_cell").agg(F.count(F.lit(1)).alias("_bc"))
    woff = (
        W.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = counts.select(
        *keys,
        "_cell",
        F.coalesce(F.sum("_bc").over(woff), F.lit(0)).alias("_off"),
    )
    # the offset table is (keys × occupied cells) — calendar-bounded,
    # broadcastable at any fact volume
    return (
        local.join(F.broadcast(offs), [*keys, "_cell"])
        .withColumn("r", F.col("_off") + F.col("_lrk"))
        .drop("_cell", "_lrk", "_off")
    )


def _cell_edge_struct(order: Sequence[str], cols: Sequence[str]) -> Column:
    """Struct whose lexicographic max/min is the per-cell last/first row:
    order columns first (aliased positionally so a column may appear in
    both ``order`` and ``cols``), carried values after."""
    fields = [F.col(o).alias(f"_o{i}") for i, o in enumerate(order)]
    fields += [F.col(c).alias(f"_v_{c}") for c in cols]
    return F.struct(*fields)


def _banded_adjacent(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    cols: Sequence[str],
    *,
    leading: bool,
    prefix: str,
) -> DataFrame:
    """Shared body of banded_prev/banded_next: local lag/lead within
    (key, cell) + a broadcast stitch carrying the previous (next)
    occupied cell's last (first) row values across cell boundaries."""
    _check_collisions(
        df,
        ["_cell"]
        + [prefix + c for c in cols]
        + ["_adj_" + c for c in cols],
        "banded_prev/banded_next",
    )
    keys, order, carry = list(key_cols), list(order_cols), list(cols)
    b = df.withColumn("_cell", cell)
    wloc = W.partitionBy(*keys, "_cell").orderBy(*order)
    shift = F.lead if leading else F.lag
    out = b
    for c in carry:
        out = out.withColumn(prefix + c, shift(F.col(c)).over(wloc))
    edge_agg = F.min if leading else F.max
    edges = b.groupBy(*keys, "_cell").agg(
        edge_agg(_cell_edge_struct(order, carry)).alias("_s")
    )
    # one row per occupied (key, cell) — calendar/value-domain bounded,
    # so the cross-cell shift window and the join broadcast are tiny
    wcell = W.partitionBy(*keys).orderBy("_cell")
    stitch = edges.select(
        *keys,
        "_cell",
        *[shift(F.col(f"_s._v_{c}")).over(wcell).alias("_adj_" + c) for c in carry],
    )
    out = out.join(F.broadcast(stitch), [*keys, "_cell"], "left")
    for c in carry:
        # carried columns must be non-null: NULL from the local shift
        # is read as "cell boundary", not as a NULL value
        out = out.withColumn(
            prefix + c, F.coalesce(F.col(prefix + c), F.col("_adj_" + c))
        ).drop("_adj_" + c)
    return out.drop("_cell")


def banded_prev(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    cols: Sequence[str],
    prefix: str = "_prev_",
) -> DataFrame:
    """Exact per-key ``lag(col)`` (previous row's values by
    ``order_cols``) with data-proportional parallelism: local lag
    within (key, cell) partitions, cell-boundary rows stitched from a
    broadcast per-cell last-row table. ``cell`` must be a monotone
    coarsening of the first order column; carried ``cols`` must be
    non-null. First row per key gets NULL, like ``F.lag``."""
    return _banded_adjacent(
        df, key_cols, order_cols, cell, cols, leading=False, prefix=prefix
    )


def banded_next(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    cols: Sequence[str],
    prefix: str = "_next_",
) -> DataFrame:
    """Exact per-key ``lead(col)`` — the mirror of :func:`banded_prev`
    (local lead + next occupied cell's first row). Last row per key
    gets NULL, like ``F.lead``."""
    return _banded_adjacent(
        df, key_cols, order_cols, cell, cols, leading=True, prefix=prefix
    )


def banded_running_sums(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    sums: dict[str, str],
    cell_name: str = "_cell",
) -> DataFrame:
    """Exact inclusive per-key running sums of several columns at once
    (``sums`` maps input column -> output column) via the two-pass
    banded discipline: local running sums within (key, cell) +
    broadcast exclusive per-cell totals, sharing ONE window pass, ONE
    per-cell aggregate, and ONE offset join for all columns. Result
    types follow ``F.sum`` (long/decimal widening), identical to the
    naive single-window form. ``key_cols`` may be empty (a global
    running sum): the cross-cell window is then unpartitioned over the
    cell series, so name the cell after its bounded grain via
    ``cell_name`` (e.g. ``"day"``) to state the claim the
    plan-invariant sweep verifies with its growth probe."""
    if cell_name in df.columns:
        raise ValueError(
            f"cell_name {cell_name!r} collides with an input column — "
            "it would be silently overwritten and dropped"
        )
    keys, order = list(key_cols), list(order_cols)
    b = df.withColumn(cell_name, cell)
    wloc = (
        W.partitionBy(*keys, cell_name)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    loc = b
    for col in sums:
        loc = loc.withColumn(f"_lsum_{col}", F.sum(col).over(wloc))
    totals = b.groupBy(*keys, cell_name).agg(
        *[F.sum(col).alias(f"_ct_{col}") for col in sums]
    )
    if not keys:
        # The cross-cell window below is unpartitioned, so its input
        # must land on one partition anyway (the cell series is
        # bounded-grain by the cell_name contract). coalesce(1) merges
        # the aggregate's output partitions in place instead of paying
        # a separate SinglePartition Exchange + stage (guide §2.4): a
        # 1-partition child satisfies the window's AllTuples
        # requirement directly.
        totals = totals.coalesce(1)
    woff = (
        W.partitionBy(*keys)
        .orderBy(cell_name)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = totals.select(
        *keys,
        cell_name,
        *[F.sum(f"_ct_{col}").over(woff).alias(f"_coff_{col}") for col in sums],
    )
    out = loc.join(F.broadcast(offs), [*keys, cell_name])
    for col, name in sums.items():
        out = out.withColumn(
            name,
            F.col(f"_lsum_{col}") + F.coalesce(F.col(f"_coff_{col}"), F.lit(0)),
        ).drop(f"_lsum_{col}", f"_coff_{col}")
    return out.drop(cell_name)


def banded_running_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    col: str,
    out: str,
    cell_name: str = "_cell",
) -> DataFrame:
    """Single-column convenience wrapper over
    :func:`banded_running_sums` (see there for the discipline and the
    ``cell_name`` contract)."""
    return banded_running_sums(
        df, key_cols, order_cols, cell, {col: out}, cell_name=cell_name
    )


def banded_rank_pick(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    rank_exprs: dict[str, Column],
) -> DataFrame:
    """Per key, the rows sitting at requested GLOBAL ranks (1-based in
    ``order_cols`` order) — median, percentile brackets, winsorize
    cuts — WITHOUT ranking or shuffling the fact stream. Per-cell
    counts (a partial-aggregable groupBy) locate the one cell whose
    exclusive-offset range covers each target rank; only those cells'
    rows are pulled (broadcast semi-filter) and row-ranked, so the
    heavy data is scanned twice but the only fact-grain shuffle
    carries ~|picks| cells of rows. ``rank_exprs`` maps a label to a
    rank expression over the per-key total count column ``n`` (e.g.
    ``F.expr("(n + 1) div 2")``). Returns, per (key, label): the
    picked row's ``df`` columns plus ``pick`` (the label) and ``n``.
    A rank outside [1, n] yields no row for that label. ``cell`` must
    be a monotone coarsening of the first order column."""
    _check_collisions(
        df,
        ["_cell", "_bc", "_off", "_rk", "_lrk", "pick", "n"],
        "banded_rank_pick",
    )
    keys, order = list(key_cols), list(order_cols)
    b = df.withColumn("_cell", cell)
    counts = b.groupBy(*keys, "_cell").agg(F.count(F.lit(1)).alias("_bc"))
    woff = (
        W.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cells = counts.select(
        *keys,
        "_cell",
        "_bc",
        F.coalesce(F.sum("_bc").over(woff), F.lit(0)).alias("_off"),
    )
    tot = counts.groupBy(*keys).agg(F.sum("_bc").alias("n"))
    picks = F.array(
        *[
            F.struct(F.lit(lbl).alias("pick"), expr.cast("long").alias("_rk"))
            for lbl, expr in rank_exprs.items()
        ]
    )
    ranks = tot.select(*keys, "n", F.explode(picks).alias("_p")).select(
        *keys, "n", "_p.pick", "_p._rk"
    )
    # exactly one cell covers each in-range rank
    targets = (
        ranks.join(cells, keys)
        .filter(
            (F.col("_rk") > F.col("_off"))
            & (F.col("_rk") <= F.col("_off") + F.col("_bc"))
        )
        .select(*keys, "_cell", "pick", "_rk", "_off", "n")
    )
    cand = b.join(
        F.broadcast(targets.select(*keys, "_cell").distinct()), [*keys, "_cell"]
    )
    wloc = W.partitionBy(*keys, "_cell").orderBy(*order)
    ranked = cand.withColumn("_lrk", F.row_number().over(wloc))
    return (
        ranked.join(F.broadcast(targets), [*keys, "_cell"])
        .filter(F.col("_off") + F.col("_lrk") == F.col("_rk"))
        .drop("_cell", "_lrk", "_rk", "_off", "_bc")
    )


def banded_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    k: int,
    rank_name: str = "r",
    input_rows_bound: int | None = None,
) -> DataFrame:
    """Per key, the first ``k`` rows in ``order_cols`` order with their
    global ranks — WITHOUT ranking or shuffling the full stream: a row
    can be in the top k only if its cell's exclusive count offset is
    below ``k``, so per-cell counts (partial-aggregable) prune the
    candidate set to ~k rows per key before any row-level window.
    Equivalent to ``row_number() <= k`` over the naive per-key window.
    ``cell`` must be a monotone coarsening of the first order column
    (ascending; negate columns for descending order).

    Size dispatch: when the caller supplies ``input_rows_bound`` — a
    cheaply-obtained UPPER bound on ``df``'s row count (e.g. the row
    count of a pre-join table; a bound BELOW the true count silently
    truncates rows, so it must be a real upper bound) — and that bound
    is at most :data:`NAIVE_TOPK_ROWS`, the naive per-key rank window
    is served instead. The banded plan scans ``df`` twice (cell counts
    + candidates), which loses when the upstream is an expensive join
    at small scale; the naive plan scans once. The input is capped via
    ``limit(input_rows_bound)`` (a no-op for a true upper bound), so
    the plan itself carries a GlobalLimit proving the window's input
    is bounded — which is how the CI funnel sweep distinguishes this
    measured-small case from an unintentional low-cardinality funnel."""
    keys, order = list(key_cols), list(order_cols)
    if input_rows_bound is not None and input_rows_bound <= NAIVE_TOPK_ROWS:
        _check_collisions(df, [rank_name], "banded_topk")
        wnaive = W.partitionBy(*keys).orderBy(*order)
        return (
            df.limit(input_rows_bound)
            # cast matches the banded branch (_off + row_number is long),
            # so the output schema is dispatch-independent
            .withColumn(rank_name, F.row_number().over(wnaive).cast("long"))
            .filter(F.col(rank_name) <= k)
        )
    _check_collisions(df, ["_cell", "_bc", "_off", rank_name], "banded_topk")
    b = df.withColumn("_cell", cell)
    counts = b.groupBy(*keys, "_cell").agg(F.count(F.lit(1)).alias("_bc"))
    woff = (
        W.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    lead_cells = (
        counts.select(
            *keys,
            "_cell",
            F.coalesce(F.sum("_bc").over(woff), F.lit(0)).alias("_off"),
        )
        .filter(F.col("_off") < k)
    )
    cand = b.join(F.broadcast(lead_cells), [*keys, "_cell"])
    wloc = W.partitionBy(*keys, "_cell").orderBy(*order)
    return (
        cand.withColumn(rank_name, F.col("_off") + F.row_number().over(wloc))
        .filter(F.col(rank_name) <= k)
        .drop("_cell", "_off")
    )


def banded_weighted_pick(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    weight_col: str,
    thresh_exprs: dict[str, Column],
) -> DataFrame:
    """Per key, the FIRST row (in ``order_cols`` order) whose
    inclusive cumulative ``weight_col`` reaches each requested
    threshold — the weighted order statistic (weighted median at
    T = W/2, weighted percentiles at T = q·W) — without ranking or
    shuffling the fact stream: per-cell weight sums locate the one
    cell whose cumulative range covers each threshold, and only those
    cells' rows get a local cumulative-weight window. ``thresh_exprs``
    maps a label to a threshold expression over the per-key total
    weight column ``w_total`` (e.g. ``F.col("w_total") / 2``). Weights must be
    non-negative; a threshold outside (0, w_total] yields no row for that
    label. Returns, per (key, label): the picked row's ``df`` columns
    plus ``pick`` (the label) and ``w_total`` (the per-key total weight).
    ``cell`` must be a monotone coarsening of the first order column."""
    _check_collisions(
        df,
        ["_cell", "_bw", "_offw", "_t", "_lcw", "_first", "pick", "w_total"],
        "banded_weighted_pick",
    )
    keys, order = list(key_cols), list(order_cols)
    b = df.withColumn("_cell", cell)
    counts = b.groupBy(*keys, "_cell").agg(F.sum(weight_col).alias("_bw"))
    woff = (
        W.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cells = counts.select(
        *keys,
        "_cell",
        "_bw",
        F.coalesce(F.sum("_bw").over(woff), F.lit(0)).alias("_offw"),
    )
    tot = counts.groupBy(*keys).agg(F.sum("_bw").alias("w_total"))
    picks = F.array(
        *[
            F.struct(F.lit(lbl).alias("pick"), expr.alias("_t"))
            for lbl, expr in thresh_exprs.items()
        ]
    )
    thresh = tot.select(*keys, "w_total", F.explode(picks).alias("_p")).select(
        *keys, "w_total", "_p.pick", "_p._t"
    )
    # the crossing cell: cumulative weight enters [_t, ...] inside it
    targets = (
        thresh.join(cells, keys)
        .filter(
            (F.col("_t") > F.col("_offw"))
            & (F.col("_t") <= F.col("_offw") + F.col("_bw"))
        )
        .select(*keys, "_cell", "pick", "_t", "_offw", "w_total")
    )
    cand = b.join(
        F.broadcast(targets.select(*keys, "_cell").distinct()), [*keys, "_cell"]
    )
    wloc = (
        W.partitionBy(*keys, "_cell")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wrow = W.partitionBy(*keys, "_cell", "pick").orderBy(*order)
    crossed = (
        cand.withColumn("_lcw", F.sum(weight_col).over(wloc))
        .join(F.broadcast(targets), [*keys, "_cell"])
        .filter(F.col("_offw") + F.col("_lcw") >= F.col("_t"))
    )
    return (
        crossed.withColumn("_first", F.row_number().over(wrow))
        .filter(F.col("_first") == 1)
        .drop("_cell", "_lcw", "_t", "_offw", "_bw", "_first")
    )


def banded_running_extrema(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
    col: str,
    max_out: str,
    min_out: str,
) -> DataFrame:
    """Per-key MAX and MIN of the inclusive running sum of ``col``
    over ``order_cols``, WITHOUT materializing the per-row prefix
    (identical values to max/min over :func:`banded_running_sum`'s
    output, one row per key). One local window pass computes
    cell-local running sums; a per-cell aggregate collapses each cell
    to (total, local max, local min); exclusive cross-cell offsets
    then shift the local extrema into global ones —
    ``max_i prefix_i = max_j (offset_j + lmax_j)`` because every
    row's global prefix is its cell's offset plus its local prefix.
    Saves the 10M-row offset join and the fact-grain re-aggregation
    of the sum-then-max form: the only frames past the single window
    pass are cell-grain."""
    _check_collisions(
        df,
        ["_cell", "_lsum", "_ct", "_lmax", "_lmin", "_gmax", "_gmin"],
        "banded_running_extrema",
    )
    keys, order = list(key_cols), list(order_cols)
    b = df.withColumn("_cell", cell)
    wloc = (
        W.partitionBy(*keys, "_cell")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    loc = b.withColumn("_lsum", F.sum(col).over(wloc))
    cells = loc.groupBy(*keys, "_cell").agg(
        F.sum(col).alias("_ct"),
        F.max("_lsum").alias("_lmax"),
        F.min("_lsum").alias("_lmin"),
    )
    woff = (
        W.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("_ct").over(woff), F.lit(0))
    g = cells.select(
        *keys,
        (off + F.col("_lmax")).alias("_gmax"),
        (off + F.col("_lmin")).alias("_gmin"),
    )
    return g.groupBy(*keys).agg(
        F.max("_gmax").alias(max_out), F.min("_gmin").alias(min_out)
    )


def chunked_frame(
    indexed: DataFrame,
    key_cols: Sequence[str],
    before: int,
    after: int,
    frame_fn: Callable[[DataFrame, W], DataFrame],
    chunk_rows: int = CHUNK_ROWS,
) -> DataFrame:
    """General halo chunking over a frame carrying the dense per-key
    index ``r``: each chunk receives the previous chunk's last
    ``before`` rows and the next chunk's first ``after`` rows as
    flagged halo rows, so any window function whose frame needs at most
    ``before`` predecessors / ``after`` successors is exact on non-halo
    rows. ``frame_fn(df, spec)`` receives the haloed frame and the
    UNFRAMED chunk-local spec ``W.partitionBy(keys, _chunk).orderBy(r)``
    (apply ``.rowsBetween`` yourself if needed — lag/lead reject an
    explicit frame) and must RETAIN all input columns (add via
    withColumn / select("*", ...)).

    Frames WIDER than a chunk chain halos across
    ``ceil(width / chunk_rows)`` neighbor chunks (each row replicates
    once per chained copy — that replication is the cost knob; widths
    needing more than :data:`MAX_HALO_CHAIN` copies per side raise,
    pointing at ``chunk_rows`` instead)."""
    before_copies = _halo_copies(before, "before", chunk_rows)
    after_copies = _halo_copies(after, "after", chunk_rows)
    keys = list(key_cols)
    base = indexed.withColumn(
        "_chunk", F.floor((F.col("r") - 1) / chunk_rows)
    ).withColumn("_halo", F.lit(False))
    parts = [base]
    # copy j supplies chunk c+j (resp. c−j) with the slice of chunk c
    # nearest the boundary; w_j is that slice's width — the whole
    # chunk once the frame fully spans intermediate chunks
    for j in range(1, before_copies + 1):
        w_j = min(chunk_rows, before - (j - 1) * chunk_rows)
        parts.append(
            base.filter(((F.col("r") - 1) % chunk_rows) >= chunk_rows - w_j)
            .withColumn("_chunk", F.col("_chunk") + j)
            .withColumn("_halo", F.lit(True))
        )
    for j in range(1, after_copies + 1):
        w_j = min(chunk_rows, after - (j - 1) * chunk_rows)
        parts.append(
            base.filter(
                (((F.col("r") - 1) % chunk_rows) < w_j) & (F.col("_chunk") >= j)
            )
            .withColumn("_chunk", F.col("_chunk") - j)
            .withColumn("_halo", F.lit(True))
        )
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    spec = W.partitionBy(*keys, "_chunk").orderBy("r")
    return frame_fn(both, spec).filter(~F.col("_halo")).drop("_chunk", "_halo")


def chunked_trailing_frame(
    indexed: DataFrame,
    key_cols: Sequence[str],
    window: int,
    frame_fn: Callable[[DataFrame, W], DataFrame],
    chunk_rows: int = CHUNK_ROWS,
) -> DataFrame:
    """Evaluate a trailing ``rowsBetween(-window, 0)`` frame over a
    frame ``indexed`` carrying the dense per-key index ``r`` (from
    ``banded_row_index``), chunked for data-proportional parallelism.
    ``frame_fn(df, w)`` receives the haloed frame and the chunk-local
    WindowSpec and must return ``df`` plus its frame columns; halo rows
    (whose frames would be incomplete) are dropped afterwards.

    Trailing frames WIDER than a chunk chain halos across
    ``ceil(window / chunk_rows)`` previous chunks (one replica per
    chained copy; more than :data:`MAX_HALO_CHAIN` copies raises —
    raise ``chunk_rows`` instead)."""
    copies = _halo_copies(window, "window", chunk_rows)
    keys = list(key_cols)
    base = indexed.withColumn(
        "_chunk", F.floor((F.col("r") - 1) / chunk_rows)
    ).withColumn("_halo", F.lit(False))
    both = base
    for j in range(1, copies + 1):
        w_j = min(chunk_rows, window - (j - 1) * chunk_rows)
        both = both.unionByName(
            base.filter(((F.col("r") - 1) % chunk_rows) >= chunk_rows - w_j)
            .withColumn("_chunk", F.col("_chunk") + j)
            .withColumn("_halo", F.lit(True))
        )
    wch = (
        W.partitionBy(*keys, "_chunk")
        .orderBy("r")
        .rowsBetween(-window, 0)
    )
    return frame_fn(both, wch).filter(~F.col("_halo")).drop("_chunk", "_halo")
