"""Mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet tables,
sorts columns by name, sorts rows, and compares values. The driver hashes
values, so this harness is *strict by default* (exact equality for
strings/ints/dates; exact equality for floats too — every query is required to
round its float outputs identically on both sides, making bit-equality the
expectation, not a hope). A tolerance fallback exists only to produce a
clearer failure message.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from stock_crypto_data_pipeline_public_spark.sources.tables import TABLES

_REL_TOL = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def fetch_spark(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    rows.sort(key=_sort_key)
    return cols, rows


def fetch_duck(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_norm(r[i]) for i in order) for r in cur.fetchall()]
    rows.sort(key=_sort_key)
    return cols, rows


def _value_eq(a, b) -> bool:
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if fa == fb:
            return True
        return math.isclose(fa, fb, rel_tol=_REL_TOL, abs_tol=1e-12)
    return a == b


def compare(name: str, spark_df, con, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    s_cols, s_rows = fetch_spark(spark_df)
    d_cols, d_rows = fetch_duck(con, oracle)
    if s_cols != d_cols:
        return [f"{name}: column mismatch spark={s_cols} duck={d_cols}"]
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    exact = True
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if sr == dr:
            continue
        exact = False
        if all(_value_eq(a, b) for a, b in zip(sr, dr)):
            errs.append(
                f"{name}: row {i} equal only within tolerance (driver hash would FAIL): "
                f"spark={sr} duck={dr}"
            )
        else:
            errs.append(f"{name}: row {i} differs: spark={sr} duck={dr}")
        if len(errs) > 5:
            errs.append(f"{name}: ... further diffs suppressed")
            break
    if not errs and not exact:
        errs.append(f"{name}: inexact float match")
    return errs
