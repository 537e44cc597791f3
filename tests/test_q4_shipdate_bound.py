"""Round-16 §7 refinement pin: q4's lineitem shipdate lower bound.

``q4_order_priority`` pre-filters lineitem to ``l_shipdate >
'1997-01-01'`` before the per-orderkey max aggregate. The bound is a
pure transfer of the orders window (every kept order has
``o_orderdate >= 1997-01-01``, so ``l_shipdate > o_orderdate`` implies
``l_shipdate > 1997-01-01``): it must change no order's EXISTS
qualification. These tests pin (a) the set equivalence on adversarial
boundary data — shipdates exactly AT the bound, orders exactly at the
window edges, orders whose only lineitems fall below the bound — and
(b) that the bound actually reaches the lineitem parquet scan as a
pushed filter (guide §6: the point of the rewrite).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

BOUND = dt.datetime(1997, 1, 1)
WIN_LO = dt.datetime(1997, 1, 1)
WIN_HI = dt.datetime(1997, 7, 1)


def _exists_qualified(orders: pd.DataFrame, lineitem: pd.DataFrame) -> set:
    """Reference semantics: the unfiltered correlated EXISTS."""
    keep = set()
    by_key: dict = {}
    for r in lineitem.itertuples():
        by_key.setdefault(r.l_orderkey, []).append(r.l_shipdate)
    for o in orders.itertuples():
        if not (WIN_LO <= o.o_orderdate < WIN_HI):
            continue
        if any(s > o.o_orderdate for s in by_key.get(o.o_orderkey, [])):
            keep.add(o.o_orderkey)
    return keep


def _bounded_max_qualified(orders: pd.DataFrame, lineitem: pd.DataFrame) -> set:
    """The rewritten plan's semantics: filter shipdate > BOUND, then
    max per orderkey, then semi-join condition max > o_orderdate."""
    li = lineitem[lineitem.l_shipdate > BOUND]
    mx = li.groupby("l_orderkey").l_shipdate.max()
    keep = set()
    for o in orders.itertuples():
        if not (WIN_LO <= o.o_orderdate < WIN_HI):
            continue
        m = mx.get(o.o_orderkey)
        if m is not None and m > o.o_orderdate:
            keep.add(o.o_orderkey)
    return keep


def test_bound_transfer_equivalence_boundary_cases():
    """Adversarial boundary grid: orders at the exact window edges,
    lineitems exactly at / just above / below the bound, orders whose
    only lineitems are below the bound (the group the filter deletes
    entirely), and multi-line orders mixing both sides of the bound."""
    d = dt.datetime
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, 11),
            "o_orderdate": [
                d(1997, 1, 1),   # exact window start
                d(1997, 6, 30),  # last in-window day
                d(1997, 7, 1),   # excluded: window end
                d(1996, 12, 31), # excluded: before window
                d(1997, 3, 1),
                d(1997, 3, 1),
                d(1997, 1, 1),
                d(1997, 2, 1),
                d(1997, 4, 1),
                d(1997, 5, 1),
            ],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3, 4, 5, 6, 7, 8, 8, 9, 10],
            "l_shipdate": [
                d(1997, 1, 1),   # == bound: filtered out; == o_orderdate: never qualifies
                d(1997, 1, 2),   # just above bound AND above the order date → qualifies
                d(1997, 6, 30),  # == o_orderdate → not strictly greater
                d(1999, 1, 1),   # order excluded by window anyway
                d(1998, 1, 1),   # order excluded by window anyway
                d(1996, 5, 5),   # below bound: group 5 vanishes entirely
                d(1997, 3, 2),   # qualifies
                d(1997, 1, 1),   # == bound, order date 1997-02-01 → no
                d(1996, 12, 31), # below bound …
                d(1997, 4, 2),   # … but this line qualifies (mixed group)
                d(1997, 4, 1),   # == o_orderdate → no
                d(1997, 5, 2),   # qualifies
            ],
        }
    )
    assert _bounded_max_qualified(orders, lineitem) == _exists_qualified(
        orders, lineitem
    ) == {1, 6, 8, 10}


def test_bound_transfer_equivalence_random():
    """Seeded random sweep concentrated around the bound/window."""
    import numpy as np

    rng = np.random.default_rng(16)
    base = dt.datetime(1996, 6, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(2000),
            "o_orderdate": [
                base + dt.timedelta(days=int(x)) for x in rng.integers(0, 500, 2000)
            ],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 2000, 8000),
            "l_shipdate": [
                base + dt.timedelta(days=int(x)) for x in rng.integers(0, 600, 8000)
            ],
        }
    )
    assert _bounded_max_qualified(orders, lineitem) == _exists_qualified(
        orders, lineitem
    )


def test_q4_plan_pushes_shipdate_bound_to_scan(spark, tmp_path):
    """The rewrite's point: the lineitem scan must carry the shipdate
    bound in PushedFilters (and the orders window stays pushed too)."""
    import tile_processor_spark.sources.tables as tables
    from tile_processor_spark.plans.relational import q4_order_priority

    d = dt.datetime
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [1, 1],
            "o_orderdate": pd.Series(
                [d(1997, 2, 1), d(1997, 3, 1)], dtype="datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT", "2-HIGH"],
            "o_orderstatus": ["F", "O"],
            "o_totalprice": [1.0, 2.0],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 2],
            "l_shipdate": pd.Series(
                [d(1997, 2, 2), d(1996, 1, 1)], dtype="datetime64[us]"
            ),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    lineitem.to_parquet(tmp_path / "lineitem.parquet")

    df = q4_order_priority(spark, str(tmp_path))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "GreaterThan(l_shipdate,1997-01-01" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate,1997-01-01" in plan, plan
    # and the result is still the EXISTS semantics on this tiny fixture:
    rows = {r.o_orderpriority: r.order_count for r in df.collect()}
    assert rows == {"1-URGENT": 1}
