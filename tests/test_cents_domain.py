"""Round-17 pin (VERDICT r16 item 6): the ``_cents`` domain contract.

``relational._cents`` (and every scaled-long aggregation built on it —
round-16 §1, round-17 rollout) assumes the touched money/measure columns
carry EXACT 2-decimal-place non-negative rationals in their doubles
(the TPC-H DECIMAL(m,2) domain the generator produces). That is a DATA
assumption, not an algebraic identity: if the driver ever regenerates a
touched column with >2dp values or negatives, the scaled-long results
would silently diverge from the decimal formulation. This gate makes
the assumption loud: it fails the suite the moment the testdata breaks
the contract, at every SF present on the machine.

The contract is also recorded in TESTDATA.md ("generator contract:
money columns").
"""

from __future__ import annotations

import os

import duckdb
import pytest

#: every (table, column) the scaled-long paths run _cents over
CENTS_COLUMNS = [
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("lineitem", "l_quantity"),
    ("orders", "o_totalprice"),
    ("events", "value"),  # events_* scaled-long window/rollup sums
]

SFS = [d for d in ("sf0.001", "sf0.01", "sf0.1") if os.path.isdir(f"/root/testdata/{d}")]


@pytest.mark.parametrize("sf", SFS)
def test_cents_columns_are_exact_2dp_nonnegative(sf):
    con = duckdb.connect()
    for table, col in CENTS_COLUMNS:
        path = f"/root/testdata/{sf}/{table}.parquet"
        if not os.path.exists(path):
            continue
        bad_frac, neg, nulls = con.execute(
            f"""
            SELECT
              COUNT(*) FILTER (WHERE abs({col} * 100 - round({col} * 100)) > 1e-6),
              COUNT(*) FILTER (WHERE {col} < 0),
              COUNT(*) FILTER (WHERE {col} IS NULL)
            FROM read_parquet('{path}')
            """
        ).fetchone()
        assert bad_frac == 0, (
            f"{sf}/{table}.{col}: {bad_frac} values are not exact 2-dp — "
            "the _cents scaled-long rewrites are NOT valid for this data; "
            "revert to the decimal formulation for this column"
        )
        assert neg == 0, (
            f"{sf}/{table}.{col}: {neg} negative values — outside the "
            "documented _cents domain"
        )
        assert nulls == 0, f"{sf}/{table}.{col}: unexpected NULLs"
