"""CLI schema-registry round-trip (reference cli.py:146-175 parity) —
no Spark session needed."""

from __future__ import annotations

from click.testing import CliRunner

from tile_processor_spark.cli import main


def test_schema_registry_roundtrip(tmp_path):
    schema = tmp_path / "cfg.yml"
    schema.write_text("database:\n  dbname: test\n")
    db = str(tmp_path / "schemas.json")
    runner = CliRunner()

    r = runner.invoke(main, ["register-schema", "demo", str(schema), "--db", db])
    assert r.exit_code == 0, r.output

    r = runner.invoke(main, ["list-schemas", "--db", db])
    assert r.exit_code == 0 and "demo" in r.output

    r = runner.invoke(main, ["remove-schema", "demo", "--db", db])
    assert r.exit_code == 0

    r = runner.invoke(main, ["list-schemas", "--db", db])
    assert r.exit_code == 0 and "demo" not in r.output

    r = runner.invoke(main, ["remove-schema", "demo", "--db", db])
    assert r.exit_code != 0  # unknown → clean error, not traceback


def test_cli_help_and_listings():
    # reference tests/test_cli.py::test_help / test_content parity
    runner = CliRunner()
    r = runner.invoke(main, ["--help"])
    assert r.exit_code == 0 and "run" in r.output
    r = runner.invoke(main, ["list-workers"])
    assert r.exit_code == 0
    for key in ("Example", "ExampleDb", "3dfier", "PCRasterise", "TileExporter"):
        assert key in r.output, r.output
    r = runner.invoke(main, ["list-queries"])
    assert r.exit_code == 0 and "q1_pricing_summary" in r.output


def test_cli_compact(spark, tmp_path):
    # spark fixture keeps the session alive so get_spark() inside the
    # command reuses it instead of building a new JVM.
    frag = tmp_path / "frag"
    spark.range(100).repartition(6).write.parquet(str(frag))
    runner = CliRunner()
    r = runner.invoke(main, ["compact", str(frag), "--target-mb", "64"])
    assert r.exit_code == 0, r.output
    assert "files 6 -> 1" in r.output
