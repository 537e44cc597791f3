"""Equivalence tests for the banded/halo window primitives
(plans/chunked_windows.py): each distributed form must be
value-identical to the naive per-key single window it replaces —
that identity is what lets the migrated queries keep their DuckDB
oracles unchanged.

The fixture frame is adversarial on purpose: duplicate order values
(tie-break via id), empty cells (gaps in the cell series), keys whose
rows span many cells, and a key confined to one cell.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from tile_processor_spark.plans.chunked_windows import (
    banded_rank_pick,
    banded_topk,
    banded_weighted_pick,
    banded_running_extrema,
    banded_running_sums,
    banded_next,
    banded_prev,
    banded_row_index,
    banded_running_sum,
    chunked_frame,
)


@pytest.fixture(scope="module")
def frame(spark):
    # (key, t, id, v): ~400 rows, 2 keys; key 'a' spans cells 0..19
    # with gaps (odd cells empty), key 'b' sits entirely in cell 3;
    # duplicate t values force the id tie-break.
    rows = []
    i = 0
    for t in range(0, 200):
        if (t // 10) % 2 == 1:  # odd cells empty for key a
            continue
        for dup in range(2):
            rows.append(("a", t, i, (t * 7 + dup) % 23))
            i += 1
    for t in range(30, 40):
        rows.append(("b", t, i, t % 5))
        i += 1
    return spark.createDataFrame(rows, "k string, t long, id long, v long")


def _cell():
    return (F.col("t") / 10).cast("long")


def test_banded_prev_matches_lag(frame):
    wo = W.partitionBy("k").orderBy("t", "id")
    naive = frame.select(
        "k", "t", "id", F.lag("t").over(wo).alias("p_t"), F.lag("v").over(wo).alias("p_v")
    )
    banded = banded_prev(frame, ["k"], ["t", "id"], _cell(), ["t", "v"]).select(
        "k",
        "t",
        "id",
        F.col("_prev_t").alias("p_t"),
        F.col("_prev_v").alias("p_v"),
    )
    assert sorted(naive.collect()) == sorted(banded.collect())


def test_banded_next_matches_lead(frame):
    wo = W.partitionBy("k").orderBy("t", "id")
    naive = frame.select("k", "t", "id", F.lead("t").over(wo).alias("n_t"))
    banded = banded_next(frame, ["k"], ["t", "id"], _cell(), ["t"]).select(
        "k", "t", "id", F.col("_next_t").alias("n_t")
    )
    assert sorted(naive.collect()) == sorted(banded.collect())


def test_banded_running_sum_matches_window(frame):
    wo = (
        W.partitionBy("k")
        .orderBy("t", "id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    naive = frame.select("k", "t", "id", F.sum("v").over(wo).alias("rs"))
    banded = banded_running_sum(frame, ["k"], ["t", "id"], _cell(), "v", "rs").select(
        "k", "t", "id", "rs"
    )
    assert sorted(naive.collect()) == sorted(banded.collect())


def test_chunked_frame_lags_and_lead(frame):
    # before=3 / after=1 with a chunk size small enough that every
    # chunk boundary is exercised; lag-3 and lead-1 must match the
    # naive per-key window exactly.
    wo = W.partitionBy("k").orderBy("t", "id")
    naive = frame.select(
        "k",
        "t",
        "id",
        F.lag("v", 3).over(wo).alias("l3"),
        F.lead("v").over(wo).alias("n1"),
    )
    idx = banded_row_index(frame, ["k"], ["t", "id"], _cell())
    out = chunked_frame(
        idx,
        ["k"],
        3,
        1,
        lambda df, spec: df.withColumn("l3", F.lag("v", 3).over(spec)).withColumn(
            "n1", F.lead("v").over(spec)
        ),
        chunk_rows=16,
    ).select("k", "t", "id", "l3", "n1")
    assert sorted(naive.collect()) == sorted(out.collect())


def test_no_key_grain_window(frame):
    # The point of the primitives: every window partitioned by the bare
    # key must be the cross-cell stitch (ordered by the bounded _cell
    # series), never a fact-grain sort — the 5-task funnel class.
    import re

    plans = [
        banded_prev(frame, ["k"], ["t", "id"], _cell(), ["v"]),
        banded_next(frame, ["k"], ["t", "id"], _cell(), ["v"]),
        banded_running_sum(frame, ["k"], ["t", "id"], _cell(), "v", "rs"),
    ]
    for df in plans:
        plan = df._jdf.queryExecution().executedPlan().toString()
        for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            cols = [c.strip() for c in s.split(",")]
            if cols and cols[0].startswith("k#"):
                rest = ",".join(cols[1:])
                assert "_cell" in rest or "_chunk" in rest, (
                    f"window partitioned by bare key over fact grain: {s[:90]}"
                )


def test_banded_running_sum_global_named_cell(frame):
    # keys=[] (a global running sum, the interval-overlap sweep shape):
    # the cross-cell window is unpartitioned over the cell series, so
    # the caller names the cell after its bounded grain.
    wo = W.orderBy("t", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = frame.select("t", "id", F.sum("v").over(wo).alias("rs"))
    banded = banded_running_sum(
        frame, [], ["t", "id"], _cell(), "v", "rs", cell_name="day"
    ).select("t", "id", "rs")
    assert sorted(naive.collect()) == sorted(banded.collect())


def test_banded_running_extrema_matches_minmax(frame):
    # signed values so the prefix actually oscillates; extrema must
    # equal max/min over the naive per-row running sum.
    signed = frame.withColumn("v", F.col("v") - 11)
    wo = (
        W.partitionBy("k")
        .orderBy("t", "id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    naive = (
        signed.select("k", F.sum("v").over(wo).alias("rs"))
        .groupBy("k")
        .agg(F.max("rs").alias("mx"), F.min("rs").alias("mn"))
    )
    banded = banded_running_extrema(
        signed, ["k"], ["t", "id"], _cell(), "v", "mx", "mn"
    )
    assert sorted(naive.collect()) == sorted(banded.collect())


def test_banded_running_sums_two_columns(frame):
    # multi-column variant: both sums from ONE window pass must match
    # their naive single-window forms.
    two = frame.withColumn("w", (F.col("v") % 3).cast("long"))
    wo = W.partitionBy("k").orderBy("t", "id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    naive = two.select(
        "k", "t", "id",
        F.sum("v").over(wo).alias("rv"),
        F.sum("w").over(wo).alias("rw"),
    )
    banded = banded_running_sums(
        two, ["k"], ["t", "id"], _cell(), {"v": "rv", "w": "rw"}
    ).select("k", "t", "id", "rv", "rw")
    assert sorted(naive.collect()) == sorted(banded.collect())


def test_banded_running_sums_rejects_cell_name_collision(frame):
    with pytest.raises(ValueError, match="collides"):
        banded_running_sums(
            frame, ["k"], ["t", "id"], _cell(), {"v": "rs"}, cell_name="v"
        )


def test_banded_rank_pick_matches_window_ranks(frame):
    # median + both winsorize cuts must equal the rows the naive
    # global rank window selects; an out-of-range rank yields no row.
    wo = W.partitionBy("k").orderBy("t", "id")
    wn = W.partitionBy("k")
    exprs = {
        "med": F.expr("(n + 1) div 2"),
        "p05": F.expr("(n * 5 + 99) div 100"),
        "p95": F.expr("(n * 95 + 99) div 100"),
        "oob": F.col("n") + 1,
    }
    naive_ranked = frame.select(
        "k", "t", "id", "v",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    naive = {}
    for lbl, e in exprs.items():
        rows = naive_ranked.filter(F.col("rn") == e).select("k", "t", "id", "v").collect()
        for r in rows:
            naive[(r["k"], lbl)] = (r["t"], r["id"], r["v"])
    picked = banded_rank_pick(
        frame, ["k"], ["t", "id"], _cell(), exprs
    ).collect()
    got = {(r["k"], r["pick"]): (r["t"], r["id"], r["v"]) for r in picked}
    assert got == naive
    assert not any(lbl == "oob" for (_, lbl) in got)


def test_banded_weighted_pick_matches_cumulative_crossing(frame):
    # weighted median + q25/q75 against the naive cumulative-weight
    # window; weights include zeros (a zero-weight row never hosts a
    # crossing it didn't earn) and a threshold over W yields no row.
    wtd = frame.withColumn("wt", (F.col("v") % 4).cast("long"))
    wo = (
        W.partitionBy("k")
        .orderBy("t", "id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = W.partitionBy("k")
    cum = wtd.select(
        "k", "t", "id", "wt",
        F.sum("wt").over(wo).alias("cumw"),
        F.sum("wt").over(wn).alias("w_total"),
    )
    exprs = {
        "q25": (F.col("w_total") + 3) / 4,
        "wmed": F.expr("(w_total + 1) div 2"),
        "q75": F.col("w_total") * 3 / 4,
        "oob": F.col("w_total") + 1,
    }
    naive = {}
    for lbl, e in exprs.items():
        rows = (
            cum.filter(F.col("cumw") >= e)
            .withColumn("rn", F.row_number().over(W.partitionBy("k").orderBy("t", "id")))
            .filter(F.col("rn") == 1)
            .collect()
        )
        for r in rows:
            naive[(r["k"], lbl)] = (r["t"], r["id"])
    got = {
        (r["k"], r["pick"]): (r["t"], r["id"])
        for r in banded_weighted_pick(
            wtd, ["k"], ["t", "id"], _cell(), "wt", exprs
        ).collect()
    }
    assert got == naive
    assert not any(lbl == "oob" for (_, lbl) in got)


def test_banded_primitives_randomized_frames(spark):
    """Three seeded random frames (duplicate timestamps, empty cells,
    singleton keys, negative values) — every banded primitive must
    match its naive single-window form on all of them. Deterministic
    seeds keep the suite stable; the frames are adversarial in shape,
    not in size."""
    import random

    for seed in (7, 23, 1009):
        rng = random.Random(seed)
        n_keys = rng.randint(1, 4)
        rows = []
        i = 0
        for k in range(n_keys):
            for _ in range(rng.randint(1, 120)):
                t = rng.randint(0, 99)
                rows.append((f"k{k}", t, i, rng.randint(-10, 10)))
                i += 1
        df = spark.createDataFrame(rows, "k string, t long, id long, v long")
        cell = (F.col("t") / rng.choice([3, 7, 10])).cast("long")
        wo = W.partitionBy("k").orderBy("t", "id")
        wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)

        naive_prev = sorted(
            df.select("k", "id", F.lag("v").over(wo).alias("p")).collect()
        )
        got_prev = sorted(
            banded_prev(df, ["k"], ["t", "id"], cell, ["v"])
            .select("k", "id", F.col("_prev_v").alias("p"))
            .collect()
        )
        assert got_prev == naive_prev, f"banded_prev mismatch, seed={seed}"

        naive_rs = sorted(
            df.select("k", "id", F.sum("v").over(wrun).alias("rs")).collect()
        )
        got_rs = sorted(
            banded_running_sum(df, ["k"], ["t", "id"], cell, "v", "rs")
            .select("k", "id", "rs")
            .collect()
        )
        assert got_rs == naive_rs, f"banded_running_sum mismatch, seed={seed}"

        naive_ex = sorted(
            df.select("k", F.sum("v").over(wrun).alias("rs"))
            .groupBy("k")
            .agg(F.max("rs").alias("mx"), F.min("rs").alias("mn"))
            .collect()
        )
        got_ex = sorted(
            banded_running_extrema(
                df, ["k"], ["t", "id"], cell, "v", "mx", "mn"
            ).collect()
        )
        assert got_ex == naive_ex, f"banded_running_extrema mismatch, seed={seed}"

        naive_med = sorted(
            df.select(
                "k",
                "v",
                F.row_number().over(wo.orderBy("v", "id")).alias("rn"),
                F.count(F.lit(1)).over(W.partitionBy("k")).alias("n"),
            )
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("k", "v")
            .collect()
        )
        got_med = sorted(
            banded_rank_pick(
                df,
                ["k"],
                ["v", "id"],
                (F.col("v") / 4).cast("long"),
                {"med": F.expr("(n + 1) div 2")},
            )
            .select("k", "v")
            .collect()
        )
        assert got_med == naive_med, f"banded_rank_pick mismatch, seed={seed}"


def test_banded_topk_matches_window_topk(frame):
    # k larger than some cells, smaller than others; ranks must carry
    # through exactly, including across the key confined to one cell.
    wo = W.partitionBy("k").orderBy("t", "id")
    for k in (1, 5, 37):
        naive = sorted(
            frame.withColumn("r", F.row_number().over(wo))
            .filter(F.col("r") <= k)
            .select("k", "t", "id", "r")
            .collect()
        )
        got = sorted(
            banded_topk(frame, ["k"], ["t", "id"], _cell(), k)
            .select("k", "t", "id", "r")
            .collect()
        )
        assert got == naive, f"banded_topk mismatch at k={k}"


def test_halo_chain_cap_rejected(frame):
    """Widths needing more than MAX_HALO_CHAIN chained copies raise
    (the duplication factor, not exactness, is the problem there)."""
    from tile_processor_spark.plans.chunked_windows import (
        MAX_HALO_CHAIN,
        chunked_trailing_frame,
    )

    idx = banded_row_index(frame, ["k"], ["t", "id"], _cell())
    too_wide = 16 * MAX_HALO_CHAIN + 1
    with pytest.raises(ValueError, match="chained halo copies"):
        chunked_trailing_frame(
            idx, ["k"], too_wide,
            lambda d, w: d.withColumn("s", F.sum("v").over(w)),
            chunk_rows=16,
        )
    with pytest.raises(ValueError, match="chained halo copies"):
        chunked_frame(
            idx, ["k"], 0, too_wide,
            lambda d, w: d.withColumn(
                "s", F.sum("v").over(w.rowsBetween(0, too_wide))
            ),
            chunk_rows=16,
        )


def test_halo_chaining_wide_frames_exact(frame):
    """Frames WIDER than a chunk (round-10 chaining) stay exact: the
    trailing and two-sided chunked frames must match the naive per-key
    window for widths spanning 2-4 chunks, including widths that are
    exact chunk multiples and a width one past the old single-copy
    bound."""
    from tile_processor_spark.plans.chunked_windows import chunked_trailing_frame

    idx = banded_row_index(frame, ["k"], ["t", "id"], _cell())
    for window in (16, 17, 40, 48, 63):
        wo = W.partitionBy("k").orderBy("t", "id").rowsBetween(-window, 0)
        naive = sorted(
            frame.select("k", "id", F.sum("v").over(wo).alias("s")).collect()
        )
        got = sorted(
            chunked_trailing_frame(
                idx, ["k"], window,
                lambda d, w: d.withColumn("s", F.sum("v").over(w)),
                chunk_rows=16,
            ).select("k", "id", "s").collect()
        )
        assert got == naive, f"window={window}"
    for before, after in ((20, 35), (0, 33), (48, 0), (16, 16)):
        wo = W.partitionBy("k").orderBy("t", "id").rowsBetween(-before, after)
        naive = sorted(
            frame.select("k", "id", F.sum("v").over(wo).alias("s")).collect()
        )
        got = sorted(
            chunked_frame(
                idx, ["k"], before, after,
                lambda d, w, b=before, a=after: d.withColumn(
                    "s", F.sum("v").over(w.rowsBetween(-b, a))
                ),
                chunk_rows=16,
            ).select("k", "id", "s").collect()
        )
        assert got == naive, f"frame=(-{before},{after})"
    # the old single-copy sweet spot still works unchanged
    wo = W.partitionBy("k").orderBy("t", "id").rowsBetween(-15, 0)
    naive = sorted(
        frame.select("k", "id", F.sum("v").over(wo).alias("s")).collect()
    )
    got = sorted(
        chunked_trailing_frame(
            idx, ["k"], 15,
            lambda d, w: d.withColumn("s", F.sum("v").over(w)),
            chunk_rows=16,
        ).select("k", "id", "s").collect()
    )
    assert got == naive


def test_banded_column_collision_guards(frame):
    # every banded helper must refuse input frames already carrying its
    # temp/output names instead of silently overwriting and dropping them
    cell = _cell()
    with pytest.raises(ValueError, match="collide"):
        banded_row_index(frame.withColumn("r", F.lit(0)), ["k"], ["t", "id"], cell)
    with pytest.raises(ValueError, match="collide"):
        banded_row_index(frame.withColumn("_cell", F.lit(0)), ["k"], ["t", "id"], cell)
    with pytest.raises(ValueError, match="collide"):
        banded_prev(
            frame.withColumn("_prev_v", F.lit(0)), ["k"], ["t", "id"], cell, ["v"]
        )
    with pytest.raises(ValueError, match="collide"):
        banded_next(
            frame.withColumn("_adj_v", F.lit(0)), ["k"], ["t", "id"], cell, ["v"]
        )
    with pytest.raises(ValueError, match="collide"):
        banded_rank_pick(
            frame.withColumn("pick", F.lit(0)), ["k"], ["v", "id"], cell,
            {"med": F.expr("(n + 1) div 2")},
        )
    with pytest.raises(ValueError, match="collide"):
        banded_topk(frame.withColumn("_off", F.lit(0)), ["k"], ["t", "id"], cell, 3)
    with pytest.raises(ValueError, match="collide"):
        banded_topk(frame, ["k"], ["t", "id"], cell, 3, rank_name="v")
    with pytest.raises(ValueError, match="collide"):
        banded_weighted_pick(
            frame.withColumn("w_total", F.lit(0)), ["k"], ["v", "id"], cell,
            "v", {"med": F.col("w_total") / 2},
        )
    with pytest.raises(ValueError, match="collide"):
        banded_running_extrema(
            frame.withColumn("_lsum", F.lit(0)), ["k"], ["t", "id"], cell,
            "v", "mx", "mn",
        )


def test_banded_topk_size_dispatch_equivalence(frame):
    # the naive branch (bound under NAIVE_TOPK_ROWS) and the banded
    # branch must agree exactly — same rows, same ranks, same schema
    naive_rows = banded_topk(
        frame, ["k"], ["t", "id"], _cell(), 5, input_rows_bound=500
    )
    banded_rows = banded_topk(frame, ["k"], ["t", "id"], _cell(), 5)
    assert naive_rows.schema == banded_rows.schema
    got_naive = sorted(naive_rows.select("k", "t", "id", "r").collect())
    got_banded = sorted(banded_rows.select("k", "t", "id", "r").collect())
    assert got_naive == got_banded
    # a bound over the threshold falls through to the banded plan
    from tile_processor_spark.plans.chunked_windows import NAIVE_TOPK_ROWS

    over = banded_topk(
        frame, ["k"], ["t", "id"], _cell(), 5,
        input_rows_bound=NAIVE_TOPK_ROWS + 1,
    )
    assert "GlobalLimit" not in over._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(over.select("k", "t", "id", "r").collect()) == got_banded


def test_curate_topk_bound_contract(spark):
    """curate_quality_by_cluster passes table_row_count('embeddings')
    as banded_topk's input_rows_bound; that is a true upper bound on
    the doc⋈embeddings join ONLY while text_quality_scores stays one
    row per doc_id (vec_id is the embeddings key). If this grain ever
    breaks, the naive branch's limit() would silently drop curate rows
    (r9 advice) — pin the grain and the bound here."""
    from tile_processor_spark.plans.llm_ops import text_quality_scores
    from tile_processor_spark.plans.pipeline_ops import curate_quality_by_cluster
    from tile_processor_spark.sources.tables import table_row_count

    sf = "/root/testdata/sf0.001"
    q = text_quality_scores(spark, sf)
    assert q.count() == q.select("doc_id").distinct().count(), (
        "text_quality_scores is no longer one row per doc_id; "
        "curate_quality_by_cluster's input_rows_bound is now unsound"
    )
    joined = curate_quality_by_cluster(spark, sf)
    assert joined.count() <= table_row_count("embeddings", sf) * 1  # bound holds
