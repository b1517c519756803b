"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row-count + column set + order-insensitive value comparison (columns sorted
by name, rows sorted), with exact equality for non-floats and 1e-9 relative
tolerance for floats."""

from __future__ import annotations

import datetime
import math
import os

import duckdb


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _row_key(row):
    return tuple((v is None, str(v)) for v in row)


def spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_row_key
    )


def duck_rows(con, sql: str):
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return sorted(cols), sorted(
        (tuple(_norm(row[i]) for i in order) for row in data), key=_row_key
    )


def _norm_strict(v):
    """Exact-representation normalization — no rounding, no tolerance.  The
    local stand-in for the driver's value hash, which is exact: two doubles
    differing in the last ulp (or an int vs a string) must FAIL here."""
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(str(_norm_strict(x)) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return v


def compare_strict(df, con, sql: str, name: str = "?") -> list[str]:
    """Driver-gate replica at full strictness: column set, row count, and
    EXACT per-value equality (column-sorted, row-sorted)."""
    rel = con.sql(sql)
    dcols = list(rel.columns)
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(
        tuple(str(_norm_strict(r[i])) for i in order) for r in rel.fetchall()
    )
    scols = sorted(df.columns)
    srows = sorted(
        tuple(str(_norm_strict(r[c])) for c in scols) for r in df.collect()
    )
    problems = []
    if scols != sorted(dcols):
        problems.append(
            f"{name}: column mismatch spark={scols} duck={sorted(dcols)}"
        )
        return problems
    if len(srows) != len(drows):
        problems.append(f"{name}: rowcount spark={len(srows)} duck={len(drows)}")
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            problems.append(
                f"{name}: first exact row diff at {i}:\n  spark={a}\n  duck ={b}"
            )
            break
    return problems


def compare(df, con, sql: str, name: str = "?") -> list[str]:
    """Returns a list of problems (empty = match)."""
    scols, srows = spark_rows(df)
    dcols, drows = duck_rows(con, sql)
    problems = []
    if scols != dcols:
        problems.append(f"{name}: column mismatch spark={scols} duck={dcols}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"{name}: rowcount spark={len(srows)} duck={len(drows)}")
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            ok = len(a) == len(b) and all(
                (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and math.isclose(x, y, rel_tol=1e-6, abs_tol=1e-6)
                )
                or x == y
                for x, y in zip(a, b)
            )
            if not ok:
                problems.append(
                    f"{name}: first row diff at {i}:\n  spark={a}\n  duck ={b}"
                )
                break
    return problems
