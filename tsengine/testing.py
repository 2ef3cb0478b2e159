"""Local replica of the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (tables pre-registered as views),
comparing row count, schema, and an order-insensitive value hash.  This
module reproduces that comparison so every operator is verified locally
before it is declared.

Discipline (SURVEY.md §4.4): queries round floating outputs to a fixed
precision on BOTH sides, so engine-order summation differences in the
last ulp never flip the hash.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the driver tables as DuckDB views, like the harness does."""
    con = duckdb.connect()
    # spill outside the repo: an expensive oracle otherwise drops its
    # temp storage in ./.tmp of the cwd (15 GB observed)
    con.execute("SET temp_directory = '/tmp/tsengine-duckdb-spill'")
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive comparison: sort columns by
    name, normalize dtypes, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            # dtype-strict: ints stay ints (widths normalized, but NEVER
            # coerced to float).  The driver hashes stringified values, so
            # an int64 Spark column vs a HUGEINT->float64 DuckDB column
            # ("1234" vs "1234.0") is a mismatch — CORRECTNESS_r04 proved
            # the old int->float64 coercion masked exactly that.
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    notes: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        extra = ("  " + "; ".join(self.notes)) if self.notes else ""
        return f"[{status}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}{extra}"


def compare(name: str, spark_df: DataFrame, sql: str, con: duckdb.DuckDBPyConnection) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    notes: list[str] = []
    ok = True
    if sorted(map(str.lower, sp.columns)) != sorted(map(str.lower, du.columns)):
        ok = False
        notes.append(f"schema mismatch: spark={sorted(sp.columns)} oracle={sorted(du.columns)}")
    if len(sp) != len(du):
        ok = False
        notes.append("row count mismatch")
    if ok and len(sp):
        du.columns = [c for c in du.columns]
        # align casing: map oracle columns to spark casing by lower-name
        lower_map = {c.lower(): c for c in sp.columns}
        du = du.rename(columns={c: lower_map.get(c.lower(), c) for c in du.columns})
        a, b = _canon(sp), _canon(du)
        if not a.equals(b):
            ok = False
            diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
            notes.append(f"value mismatch in columns {diff_cols}")
            for c in diff_cols[:2]:
                neq = a[c] != b[c]
                if neq.any():
                    i = neq[neq].index[0]
                    notes.append(f"  {c}[{i}]: spark={a[c][i]!r} oracle={b[c][i]!r}")
                else:
                    notes.append(f"  {c}: dtype mismatch {a[c].dtype} vs {b[c].dtype}")
    return CompareResult(name, ok, len(sp), len(du), notes)


def assert_match(name: str, spark_df: DataFrame, sql: str, sf_dir: str) -> None:
    con = duck_connect(sf_dir)
    try:
        res = compare(name, spark_df, sql, con)
    finally:
        con.close()
    if not res.ok:
        raise AssertionError(str(res))
