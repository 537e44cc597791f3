"""PostgreSQL as a Spark 4 Python Data Source (``tps_postgres``) over
the pure-Python wire client (``sources/pgwire.py``) — the engine-grade
replacement for the never-exercised JDBC tier in a container without a
JDBC driver jar:

    spark.dataSource.register(PostgresDataSource)
    spark.read.format("tps_postgres")
         .option("host", "127.0.0.1").option("port", 5432)
         .option("user", "app").option("database", "db")
         .option("dbtable", "public.orders")          # or .option("query", ...)
         .option("partition_column", "o_orderkey")     # JDBC-style parallel read
         .option("lower_bound", 1).option("upper_bound", 600000)
         .option("num_partitions", 8)
         .load()

Reference parity: the reference engine's production tables live in
PostgreSQL (tile_processor/db.py builds the DSN and the per-tile
queries; tests/conftest.py:49-59 runs a dockerized database tier).
This connector expresses that path Spark-first:

- **filter pushdown** (Spark 4.1 ``pushFilters``): simple comparisons,
  IN lists, and NULL checks compile to a server-side WHERE — the
  predicate runs where the index lives, the wire carries only
  surviving rows (the JDBC ``PushedFilters`` story, visible in
  ``reader.pushed_sql()``);
- **partitioned parallel reads**: JDBC-style stride ranges on a
  numeric column, first/last partitions unbounded, one connection per
  task;
- **bulk writes** via COPY FROM STDIN inside a per-task transaction —
  a failed task rolls back atomically, so task retries don't
  duplicate (the same at-least-once-under-stage-retry contract as
  Spark's own JDBC writer); ``mode('overwrite')`` truncates
  driver-side first.

Types map from pg_type OIDs (bool, int2/4/8, float4/8, numeric→
decimal(38,18), text/varchar/char, date, timestamp, timestamptz);
anything else refuses loudly rather than mis-reading.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from tile_processor_spark.sources import pgwire

FORMAT_NAME = "tps_postgres"

_OID_TO_SPARK = {
    pgwire.OID_BOOL: T.BooleanType(),
    pgwire.OID_INT2: T.ShortType(),
    pgwire.OID_INT4: T.IntegerType(),
    pgwire.OID_INT8: T.LongType(),
    pgwire.OID_FLOAT4: T.FloatType(),
    pgwire.OID_FLOAT8: T.DoubleType(),
    pgwire.OID_NUMERIC: T.DecimalType(38, 18),
    pgwire.OID_TEXT: T.StringType(),
    pgwire.OID_VARCHAR: T.StringType(),
    pgwire.OID_BPCHAR: T.StringType(),
    pgwire.OID_DATE: T.DateType(),
    pgwire.OID_TIMESTAMP: T.TimestampNTZType(),
    pgwire.OID_TIMESTAMPTZ: T.TimestampType(),
}


def _connect(options: dict) -> pgwire.PGConnection:
    return pgwire.PGConnection(
        host=options.get("host", "127.0.0.1"),
        port=int(options.get("port", 5432)),
        user=options.get("user", "postgres"),
        database=options.get("database", "postgres"),
        password=options.get("password"),
        channel_binding=options.get("channel_binding", "disable"),
        sslmode=options.get("sslmode", "disable"),
        sslrootcert=options.get("sslrootcert"),
    )


def _relation(options: dict) -> str:
    dbtable = options.get("dbtable")
    query = options.get("query")
    if bool(dbtable) == bool(query):
        raise ValueError(
            "tps_postgres needs exactly one of .option('dbtable', ...) "
            "or .option('query', ...)"
        )
    return dbtable if dbtable else f"({query}) tps_q"


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and not math.isfinite(v):
        # bare nan/inf is invalid PG syntax and would fail the whole
        # read server-side; refuse so _filter_sql yields the predicate
        # back for Spark to evaluate (ADVICE r11)
        raise TypeError("non-finite float literal not pushable")
    if isinstance(v, (int, float, Decimal)):
        return str(v)
    if isinstance(v, datetime.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "'" + v.isoformat() + "'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unsupported literal type {type(v)}")


def _parse_value(text: str | None, oid: int):
    if text is None:
        return None
    if oid in (pgwire.OID_INT2, pgwire.OID_INT4, pgwire.OID_INT8):
        return int(text)
    if oid in (pgwire.OID_FLOAT4, pgwire.OID_FLOAT8):
        return float(text)
    if oid == pgwire.OID_NUMERIC:
        return Decimal(text)
    if oid == pgwire.OID_BOOL:
        return text == "t"
    if oid == pgwire.OID_DATE:
        return datetime.date.fromisoformat(text)
    if oid == pgwire.OID_TIMESTAMP:
        return datetime.datetime.fromisoformat(text)
    if oid == pgwire.OID_TIMESTAMPTZ:
        # PG emits '+HH' / '+HH:MM' offsets; fromisoformat handles both
        return datetime.datetime.fromisoformat(text)
    return text


class _RangePartition(InputPartition):
    def __init__(self, clause: str | None):
        self.clause = clause


class PostgresReader(DataSourceReader):
    """Base reader WITHOUT ``pushFilters``: every predicate stays in
    Spark (full scan + Spark-side filters — correct, just more bytes
    over the wire). Selected via ``.option("pushdown", "false")`` for
    sessions that pin ``spark.sql.python.filterPushdown.enabled`` off,
    because Spark's planning worker hard-errors on a reader class that
    ADVERTISES pushFilters while the conf is disabled (the
    CORRECTNESS_r12 snapshot-connector failure, same bug class)."""

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._options = options
        self._pushed: list[str] = []

    @staticmethod
    def _filter_sql(f) -> str | None:
        col = getattr(f, "attribute", None)
        if not col or len(col) != 1:
            return None
        ident = _quote_ident(col[0])
        try:
            if isinstance(f, EqualTo):
                return f"{ident} = {_literal(f.value)}"
            # String RANGE predicates are NOT pushable: the server
            # compares under the database collation while Spark uses
            # binary UTF-8 order, and Spark does not re-apply pushed
            # filters — the row sets can differ (ADVICE r11). Equality,
            # IN and NULL checks are collation-independent.
            if isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, str):
                return None
            if isinstance(f, GreaterThan):
                return f"{ident} > {_literal(f.value)}"
            if isinstance(f, GreaterThanOrEqual):
                return f"{ident} >= {_literal(f.value)}"
            if isinstance(f, LessThan):
                return f"{ident} < {_literal(f.value)}"
            if isinstance(f, LessThanOrEqual):
                return f"{ident} <= {_literal(f.value)}"
            if isinstance(f, In):
                # pyspark's In carries its tuple of values in `.value`
                vals = ", ".join(_literal(v) for v in f.value)
                return f"{ident} IN ({vals})" if vals else None
            if isinstance(f, IsNull):
                return f"{ident} IS NULL"
            if isinstance(f, IsNotNull):
                return f"{ident} IS NOT NULL"
        except TypeError:
            return None
        return None

    def pushed_sql(self) -> str:
        """The WHERE fragment pushed to the server (for tests/EXPLAIN
        parity with JDBC's PushedFilters)."""
        return " AND ".join(self._pushed)

    def partitions(self):
        col = self._options.get("partition_column")
        if not col:
            return [_RangePartition(None)]
        lo = int(self._options["lower_bound"])
        hi = int(self._options["upper_bound"])
        n = int(self._options.get("num_partitions", 4))
        if n <= 1 or hi <= lo:
            return [_RangePartition(None)]
        ident = _quote_ident(col)
        stride = (hi - lo) // n or 1
        parts = []
        for i in range(n):
            a, b = lo + i * stride, lo + (i + 1) * stride
            if i == 0:
                parts.append(_RangePartition(f"{ident} < {b}"))
            elif i == n - 1:
                parts.append(_RangePartition(f"{ident} >= {a}"))
            else:
                parts.append(_RangePartition(f"{ident} >= {a} AND {ident} < {b}"))
        return parts

    def read(self, partition):
        cols = [f.name for f in self._schema.fields]
        sel = ", ".join(_quote_ident(c) for c in cols)
        where = list(self._pushed)
        if partition.clause:
            where.append(partition.clause)
        sql = f"SELECT {sel} FROM {_relation(self._options)}"
        if where:
            sql += " WHERE " + " AND ".join(f"({w})" for w in where)
        conn = _connect(self._options)
        try:
            rcols, rows = conn.query(sql)
            oids = [oid for _n, oid in rcols]
            for row in rows:
                yield tuple(_parse_value(v, oid) for v, oid in zip(row, oids))
        finally:
            conn.close()


class PostgresPushdownReader(PostgresReader):
    # -- Spark 4.1 filter pushdown: compile what we can to SQL, hand
    # the rest back (they are re-applied by Spark post-scan) --
    def pushFilters(self, filters):
        for f in filters:
            sql = self._filter_sql(f)
            if sql is None:
                yield f
            else:
                self._pushed.append(sql)


class _PGWriteMessage(WriterCommitMessage):
    def __init__(self, rows: int):
        self.rows = rows


class PostgresWriter(DataSourceWriter):
    """COPY-based writer: each task streams its rows as one COPY FROM
    STDIN inside a transaction (rollback on failure → clean task
    retries). ``overwrite`` truncates once, driver-side, before tasks
    run."""

    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        self._schema = schema
        self._options = options
        table = options.get("dbtable")
        if not table:
            raise ValueError("tps_postgres write requires .option('dbtable', ...)")
        self._table = table
        if overwrite:
            conn = _connect(options)
            try:
                conn.execute(f"TRUNCATE TABLE {table}")
            finally:
                conn.close()

    @staticmethod
    def _to_text(v) -> str:
        if v is None:
            return "\\N"
        if isinstance(v, bool):
            return "t" if v else "f"
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
        if not isinstance(v, (str, int, float, Decimal)):
            # bytes/arrays/maps would be str()-ed into Python repr text
            # and silently corrupt the target table — refuse loudly
            # (ADVICE r11); the documented type map is scalars only
            raise TypeError(
                f"tps_postgres COPY writer does not support {type(v).__name__} "
                "values; supported: str, int, float, Decimal, bool, "
                "date, datetime, None"
            )
        return pgwire.PGConnection.copy_escape(str(v))

    def write(self, iterator):
        cols = ", ".join(_quote_ident(f.name) for f in self._schema.fields)
        conn = _connect(self._options)
        n = 0
        try:
            conn.execute("BEGIN")
            n = conn.copy_in(
                f"COPY {self._table} ({cols}) FROM STDIN",
                ("\t".join(self._to_text(v) for v in row) for row in iterator),
            )
            conn.execute("COMMIT")
        except Exception:
            try:
                conn.execute("ROLLBACK")
            finally:
                conn.close()
            raise
        conn.close()
        return _PGWriteMessage(n)

    def commit(self, messages) -> None:
        pass  # per-task transactions already committed

    def abort(self, messages) -> None:
        pass  # failed tasks rolled back themselves; committed tasks stay
        # (at-least-once under stage retry — the JDBC writer contract)


class PostgresDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        conn = _connect(self.options)
        try:
            cols, _rows = conn.query(
                f"SELECT * FROM {_relation(self.options)} LIMIT 0"
            )
        finally:
            conn.close()
        fields = []
        for name, oid in cols:
            dt = _OID_TO_SPARK.get(oid)
            if dt is None:
                raise NotImplementedError(
                    f"column {name!r} has unmapped PostgreSQL type OID {oid}"
                )
            fields.append(T.StructField(name, dt))
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> PostgresReader:
        # server-side predicate pushdown by default (register()
        # guarantees the session conf); .option("pushdown", "false")
        # falls back to full scan + Spark-side filters
        opt = str(self.options.get("pushdown", "true")).lower()
        cls = PostgresReader if opt == "false" else PostgresPushdownReader
        return cls(schema, self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> PostgresWriter:
        return PostgresWriter(schema, self.options, overwrite)

    def simpleStreamReader(self, schema: T.StructType) -> "PostgresStreamReader":
        return PostgresStreamReader(schema, self.options)


def register(spark) -> None:
    """Register the format AND enable
    ``spark.sql.python.filterPushdown.enabled`` (runtime SQL conf,
    default false in Spark 4.1): the default reader advertises
    ``pushFilters``, and Spark hard-errors rather than silently
    ignoring an advertised pushdown when the conf is off — on a
    vanilla session the read would fail before fetching a row. A conf
    the session pinned EXPLICITLY (either value) is respected, never
    overridden (ADVICE r13) — pinned-false environments read with
    ``.option("pushdown", "false")``."""
    from tile_processor_spark.sources.ds_conf import ensure_python_pushdown_conf

    ensure_python_pushdown_conf(spark)
    spark.dataSource.register(PostgresDataSource)


class PostgresStreamReader(SimpleDataSourceStreamReader):
    """Incremental STREAMING reads over a monotonically increasing
    column — the classic keyset-pagination CDC-lite pattern (the same
    contract as Kafka offsets or the snapshot connector's version
    stream, expressed over a plain table):

        spark.readStream.format("tps_postgres")
             .option("dbtable", "events")
             .option("offset_column", "event_id")   # monotonic, NOT NULL
             .load()

    Offsets are ``{"max": <last seen value>}``; each micro-batch is
    ``WHERE offset_column > start.max`` (and ``<= end.max`` on replay),
    so batches are REPLAYABLE between checkpointed offsets as long as
    the column is append-only — rows must never be inserted behind the
    high-water mark (the standard caveat of keyset CDC; real mutation
    capture needs log-based CDC, out of scope and documented).
    ``starting_offset`` options: 'latest' (default — only new rows) or
    'earliest' (bootstrap with the full table)."""

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._options = options
        self._col = options.get("offset_column")
        if not self._col:
            raise ValueError(
                "tps_postgres streaming requires .option('offset_column', "
                "<monotonic NOT NULL numeric column>)"
            )
        self._ident = _quote_ident(self._col)

    def _max_offset(self) -> int | None:
        conn = _connect(self._options)
        try:
            _cols, rows = conn.query(
                f"SELECT max({self._ident}) FROM {_relation(self._options)}"
            )
        finally:
            conn.close()
        v = rows[0][0]
        return int(v) if v is not None else None

    def initialOffset(self) -> dict:
        if self._options.get("starting_offset", "latest") == "earliest":
            return {"max": None}
        return {"max": self._max_offset()}

    def _select(self, lo, hi) -> str:
        cols = ", ".join(_quote_ident(f.name) for f in self._schema.fields)
        sql = f"SELECT {cols} FROM {_relation(self._options)}"
        where = []
        if lo is not None:
            where.append(f"{self._ident} > {int(lo)}")
        if hi is not None:
            where.append(f"{self._ident} <= {int(hi)}")
        if where:
            sql += " WHERE " + " AND ".join(where)
        return sql + f" ORDER BY {self._ident}"

    def _fetch(self, lo, hi):
        conn = _connect(self._options)
        try:
            rcols, rows = conn.query(self._select(lo, hi))
            oids = [oid for _n, oid in rcols]
            return [
                tuple(_parse_value(v, oid) for v, oid in zip(row, oids))
                for row in rows
            ]
        finally:
            conn.close()

    def read(self, start: dict):
        hi = self._max_offset()
        lo = start.get("max")
        if hi is None or (lo is not None and hi <= lo):
            return iter([]), start  # nothing new
        return iter(self._fetch(lo, hi)), {"max": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay from checkpointed offsets
        return iter(self._fetch(start.get("max"), end.get("max")))

    def commit(self, end: dict) -> None:
        pass  # source-side retention is the table's business
