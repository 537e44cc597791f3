"""DuckDB oracle comparison harness — mirrors (strictly) what the driver's
correctness gate does: run the Spark query and the oracle SQL on the same
parquet tables, canonicalize (columns sorted by name, rows sorted by all
columns), and compare values.

Our comparison is *stricter* than an order-insensitive value hash: floats
must match bit-for-bit (the engine's decimal-accumulate discipline makes
that achievable), so passing here implies passing the driver gate.
"""

from __future__ import annotations

from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from tile_processor_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize dtypes that differ only in representation.
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: v.tolist() if isinstance(v, np.ndarray) else v)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def compare_query(
    spark: SparkSession, name: str, spark_fn, oracle: str | None, sf_dir: str
) -> CompareResult:
    sdf = spark_fn(spark, sf_dir).toPandas()
    if oracle is None:
        return CompareResult(name, True, len(sdf), -1, "rows-only (no oracle)")
    with duckdb_connection(sf_dir) as con:
        odf = con.execute(oracle).df()
    a, b = canonicalize(sdf), canonicalize(odf)
    if list(a.columns) != list(b.columns):
        return CompareResult(
            name, False, len(a), len(b), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
        )
    if len(a) != len(b):
        return CompareResult(name, False, len(a), len(b), "row count differs")
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                i = int(np.argmin(eq))
                return CompareResult(
                    name, False, len(a), len(b),
                    f"float col {c} differs at row {i}: {av[i]!r} vs {bv[i]!r} "
                    f"(maxabs {np.nanmax(np.abs(av - bv)):.3e})",
                )
        else:
            mism = ~(pd.Series(av).eq(pd.Series(bv)) | (pd.isna(av) & pd.isna(bv)))
            if mism.any():
                i = int(mism.idxmax())
                return CompareResult(
                    name, False, len(a), len(b),
                    f"col {c} differs at row {i}: {av[i]!r} vs {bv[i]!r}",
                )
    return CompareResult(name, True, len(a), len(b))
