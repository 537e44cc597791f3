"""Round-trip contract for the multi-format source layer
(sources/formats.py): every supported format reproduces the frame
value-for-value under an explicit schema, and text formats refuse
schema inference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tile_processor_spark.sources.formats import FORMATS, read_any, write_any
from tile_processor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

def _canon(df):
    return sorted(
        (r.o_orderkey, r.o_custkey, r.o_orderstatus, r.o_totalprice,
         r.o_orderdate, r.o_orderpriority)
        for r in df.collect()
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_value_exact(spark, tmp_path, fmt):
    o = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    path = str(tmp_path / f"orders_{fmt}")
    write_any(o, path, fmt)
    # read back under the frame's own schema (orders carries long /
    # double / string / NTZ-timestamp columns)
    back = read_any(spark, path, fmt, schema=o.schema)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in o.schema.fields
    ]
    assert _canon(back) == _canon(o)


def test_text_formats_refuse_inference(spark, tmp_path):
    for fmt in ("csv", "json"):
        with pytest.raises(ValueError, match="explicit schema"):
            read_any(spark, str(tmp_path / "x"), fmt)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        write_any(load_table(spark, "region", SF), str(tmp_path / "r"), "avro")


def test_parquet_pushdown_survives_roundtrip(spark, tmp_path):
    # the data-plane formats must keep predicate pushdown after landing
    o = load_table(spark, "orders", SF)
    path = str(tmp_path / "orders_pq")
    write_any(o, path, "parquet")
    plan = (
        read_any(spark, path, "parquet")
        .filter(F.col("o_orderkey") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in plan
