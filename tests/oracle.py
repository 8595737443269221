"""Local mirror of the driver's Spark-vs-DuckDB oracle comparison.

Runs a catalog query and its oracle SQL on the same parquet tables,
sorts columns by name and rows by value, and asserts exact equality
(floats: bit-exact, mirroring a value-hash). Exercised by
tests/test_oracle_parity.py at sf0.001 so oracle drift is caught before
the driver's sf0.01 gate.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

from dbt_foundation_spark.queries._util import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # arrays/lists → tuples so they sort/compare
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    sort_cols = [c for c in df.columns if df[c].map(lambda v: not isinstance(v, tuple)).all()]
    df = df.sort_values(by=sort_cols or list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str, name: str = "?") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # The driver's value-hash stringifies cells, so int64 78 vs
        # float64 78.0 is a driver MISMATCH even though it compares
        # numerically equal — reject dtype-class drift outright.
        if pd.api.types.is_float_dtype(g) != pd.api.types.is_float_dtype(w):
            raise AssertionError(
                f"{name}.{c}: dtype class mismatch spark={g.dtype} oracle={w.dtype} "
                f"(driver hashes strings: 78 != 78.0 — CAST the oracle aggregate)"
            )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = (g.isna() & w.isna()) | (g.astype("float64") == w.astype("float64"))
            if not ok.all():
                bad = (~ok).idxmax()
                diff = abs(float(g[bad]) - float(w[bad]))
                raise AssertionError(
                    f"{name}.{c}: float mismatch at row {bad}: spark={g[bad]!r} "
                    f"oracle={w[bad]!r} |diff|={diff:g}"
                )
        else:
            ga, wa = g.astype(object).where(~g.isna(), None), w.astype(object).where(~w.isna(), None)
            if not ga.equals(wa):
                neq = [i for i in range(len(ga)) if ga[i] != wa[i]][:3]
                raise AssertionError(
                    f"{name}.{c}: value mismatch rows {neq}: "
                    f"spark={[ga[i] for i in neq]} oracle={[wa[i] for i in neq]}"
                )
