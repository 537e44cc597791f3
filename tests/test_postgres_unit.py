"""Pure-unit tier for the tps_postgres connector — the pushdown
compiler and COPY text encoding contracts that must hold regardless of
any live server (the live tier is tests/test_postgres_live.py):

- string RANGE predicates are never pushed (server collation vs
  Spark's binary UTF-8 order — Spark does not re-apply pushed
  filters, so a pushed `name < 'm'` could return a different row set);
- non-finite float literals are never pushed (bare nan/inf is invalid
  PG syntax and would fail the whole read server-side);
- the COPY writer refuses types outside the documented scalar map
  instead of str()-ing Python reprs into the target table.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

from tile_processor_spark.sources.postgres_datasource import (
    PostgresPushdownReader,
    PostgresWriter,
    _literal,
)

_sql = PostgresPushdownReader._filter_sql


def test_numeric_and_date_ranges_still_push():
    assert _sql(GreaterThan(("k",), 5)) == '"k" > 5'
    assert _sql(LessThanOrEqual(("x",), 2.5)) == '"x" <= 2.5'
    assert (
        _sql(GreaterThanOrEqual(("d",), datetime.date(2024, 1, 2)))
        == "\"d\" >= '2024-01-02'"
    )


def test_string_range_predicates_are_not_pushed():
    # collation-dependent: must be yielded back for Spark to evaluate
    for f in (
        GreaterThan(("s",), "m"),
        GreaterThanOrEqual(("s",), "m"),
        LessThan(("s",), "m"),
        LessThanOrEqual(("s",), "m"),
    ):
        assert _sql(f) is None
    # collation-independent string predicates still push
    assert _sql(EqualTo(("s",), "m")) == "\"s\" = 'm'"
    assert _sql(In(("s",), ("a", "b"))) == "\"s\" IN ('a', 'b')"
    assert _sql(IsNotNull(("s",))) == '"s" IS NOT NULL'


def test_nonfinite_float_literals_are_not_pushed():
    for v in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(TypeError):
            _literal(v)
        assert _sql(EqualTo(("x",), v)) is None
        assert _sql(GreaterThan(("x",), v)) is None
        assert _sql(In(("x",), (1.0, v))) is None
    assert _literal(2.5) == "2.5"


def test_copy_text_refuses_unmapped_types():
    to_text = PostgresWriter._to_text
    assert to_text(None) == "\\N"
    assert to_text(True) == "t"
    assert to_text("a\tb") == "a\\tb"
    assert to_text(Decimal("1.50")) == "1.50"
    assert to_text(datetime.date(2024, 1, 2)) == "2024-01-02"
    for bad in (b"\x00\x01", bytearray(b"x"), [1, 2], {"k": 1}, (1,)):
        with pytest.raises(TypeError, match="COPY writer does not support"):
            to_text(bad)


def test_tls_negotiation_on_closed_socket_raises_pg_error():
    """A server that closes the connection before answering SSLRequest
    is a connect failure, NOT an 'N' refusal: under sslmode=prefer the
    old code proceeded to send the startup packet on a dead socket and
    surfaced a confusing later error (ADVICE r12)."""
    import socket
    import threading

    from tile_processor_spark.sources.pgwire import PGConnection, PGError

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    host, port = srv.getsockname()

    def _slam():
        conn, _addr = srv.accept()
        conn.recv(8)  # consume the SSLRequest, answer nothing
        conn.close()

    t = threading.Thread(target=_slam, daemon=True)
    t.start()
    with pytest.raises(PGError, match="closed during SSL negotiation"):
        PGConnection(
            host=host, port=port, user="u", password="p",
            database="d", sslmode="prefer",
        )
    t.join(timeout=5)
    srv.close()


def test_reader_class_selection_by_pushdown_option():
    """The pushdown/no-pushdown reader split (vanilla-session fix): the
    default advertises pushFilters; .option('pushdown','false') selects
    the base class so conf-locked sessions can still read."""
    from pyspark.sql.types import StructType

    from tile_processor_spark.sources.postgres_datasource import (
        PostgresDataSource,
        PostgresPushdownReader,
        PostgresReader,
    )

    schema = StructType([])
    ds = PostgresDataSource(options={"dbtable": "t"})
    assert type(ds.reader(schema)) is PostgresPushdownReader
    ds_off = PostgresDataSource(options={"dbtable": "t", "pushdown": "false"})
    assert type(ds_off.reader(schema)) is PostgresReader
    # only the subclass overrides pushFilters — the exact property
    # Spark's planning worker checks before hard-erroring
    from pyspark.sql.datasource import DataSourceReader

    assert "pushFilters" not in PostgresReader.__dict__
    assert PostgresPushdownReader.pushFilters is not DataSourceReader.pushFilters
