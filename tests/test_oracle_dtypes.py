"""Oracle dtype hygiene: no oracle may emit DuckDB-widened integer types
(HUGEINT from SUM over BIGINT, unsigned variants). The LOCAL gate
canonicalizes integer dtypes so it cannot catch this, but the driver's
value-hash distinguishes them — exactly the round-1 amber failure mode
(q12 / dedup_simhash / ann_lsh_buckets). DESCRIBE-only: no Spark, no
query execution."""

from __future__ import annotations

import duckdb
import pytest

from tile_processor_spark.plans.registry import all_specs
from tile_processor_spark.sources.tables import TABLE_NAMES

SF = "/root/testdata/sf0.01"
WIDENED = {"HUGEINT", "UHUGEINT", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )
    return c


SPECS = {n: s for n, s in all_specs().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_emits_no_widened_integers(con, name):
    desc = con.execute(f"DESCRIBE ({SPECS[name].oracle})").df()
    offenders = [
        (r["column_name"], r["column_type"])
        for _, r in desc.iterrows()
        if r["column_type"] in WIDENED
    ]
    assert not offenders, (
        f"{name}: {offenders} — wrap the aggregate in CAST(... AS BIGINT) "
        "so the driver's value-hash sees the same dtype Spark emits"
    )
