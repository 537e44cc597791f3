"""Python UDTF surface: SQL-registrable table functions compose with
LATERAL, parse tile ids like tile_file_index, and generate chunk spans
with exact boundary semantics."""

from __future__ import annotations

from tile_processor_spark.functions.udtf import register_udtfs


def test_split_tile_id_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [("25gn1_a",), ("25gn1",), ("not a tile",), (None,)], "tile string"
    ).createOrReplaceTempView("tiles_udtf")
    rows = spark.sql(
        "SELECT t.tile, s.stem, s.row, s.col, s.sub "
        "FROM tiles_udtf t, LATERAL split_tile_id(t.tile) s ORDER BY t.tile"
    ).collect()
    # malformed + NULL ids produce no rows (UDTF zero-row skip)
    assert [(r.tile, r.stem, r.row, r.col, r.sub) for r in rows] == [
        ("25gn1", "25gn1", 25, "gn", None),
        ("25gn1_a", "25gn1", 25, "gn", "a"),
    ]


def test_chunk_spans_boundaries(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_spans(100, 64, 48) ORDER BY chunk_idx"
    ).collect()
    assert [(r.chunk_idx, r.start_tok, r.end_tok) for r in rows] == [
        (0, 0, 64),
        (1, 48, 100),
    ]
    # short doc: one whole-doc chunk
    short = spark.sql("SELECT * FROM chunk_spans(10, 64, 48)").collect()
    assert [(r.chunk_idx, r.start_tok, r.end_tok) for r in short] == [(0, 0, 10)]
    # degenerate inputs: no rows
    assert spark.sql("SELECT * FROM chunk_spans(0, 64, 48)").count() == 0
    # full coverage: every token in [0, n) is inside some span
    rows = spark.sql("SELECT * FROM chunk_spans(200, 64, 48)").collect()
    covered = set()
    for r in rows:
        covered.update(range(r.start_tok, r.end_tok))
    assert covered == set(range(200))
