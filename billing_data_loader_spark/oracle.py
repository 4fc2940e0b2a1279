"""Local replica of the driver's DuckDB oracle comparison loop.

The driver runs each declared query in Spark AND its ``oracle_sql`` in DuckDB
over the same parquet, then compares row-count + schema + order-insensitive
value-hash. This module reproduces that check locally so keys are only
declared after passing here (SURVEY.md §5.4).

Canonicalization: sort columns by name, normalize cells to plain Python
values, sort rows by their repr (stable for bit-identical floats), compare
exactly. We aim for bit-equality — determinism helpers in
``functions.determinism`` make float aggregates reduction-order-insensitive.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal as _Decimal

import duckdb
import numpy as np
import pandas as pd

from .tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the fixture tables registered as views."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, _Decimal):
        # pandas renders DuckDB decimals as float64 but Spark's as Decimal;
        # both convert to the identical nearest double.
        return float(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None) if v.tzinfo else v
    if isinstance(v, _dt.date):
        # DATE columns come back as datetime64 from DuckDB's fetchdf but as
        # date objects from Spark+Arrow; compare at midnight-datetime.
        return _dt.datetime(v.year, v.month, v.day)
    if v is pd.NaT:
        return None
    return v


def canonical_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(c.lower() for c in pdf.columns)
    pdf = pdf.rename(columns={c: c.lower() for c in pdf.columns})
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple(repr(x) for x in r))
    return cols, rows


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> tuple[bool, str]:
    s_cols, s_rows = canonical_rows(spark_pdf)
    o_cols, o_rows = canonical_rows(oracle_pdf)
    if s_cols != o_cols:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    if len(s_rows) != len(o_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            diffs = [
                (c, a, b) for c, a, b in zip(s_cols, sr, orow) if a != b
            ]
            return False, (
                f"first differing row #{i} (of {len(s_rows)}): "
                + "; ".join(f"{c}: spark={a!r} oracle={b!r}" for c, a, b in diffs[:5])
            )
    return True, f"OK ({len(s_rows)} rows, {len(s_cols)} cols)"


def _col_kinds(pdf: pd.DataFrame) -> dict[str, str | None]:
    """Classify each column the way the driver's canonicalizer sees cells.

    The driver hashes raw cells: nested (list/ndarray/dict) cells crash its
    pandas-based canonicalizer, Decimal vs float64 and bigint vs double can
    never hash-match (CORRECTNESS_r01). This local replica flags those
    *before* the lenient value comparison so regressions fail in pytest.
    """
    kinds: dict[str, str | None] = {}
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        if k in "iu":
            kinds[c.lower()] = "int"
        elif k == "f":
            kinds[c.lower()] = "float"
        elif k == "b":
            kinds[c.lower()] = "bool"
        elif k == "M":
            kinds[c.lower()] = "datetime"
        else:
            kind: str | None = None
            for v in pdf[c].head(1000):
                if v is None or v is pd.NaT:
                    continue
                if isinstance(v, float) and math.isnan(v):
                    continue
                if isinstance(v, (list, tuple, np.ndarray, dict, set)):
                    kind = "NESTED"
                elif isinstance(v, _Decimal):
                    kind = "DECIMAL"
                elif isinstance(v, (str, bytes)):
                    kind = "str"
                elif isinstance(v, (bool, np.bool_)):
                    kind = "bool"
                elif isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
                    kind = "datetime"
                elif isinstance(v, (int, np.integer)):
                    kind = "int"
                elif isinstance(v, (float, np.floating)):
                    kind = "float"
                else:
                    kind = f"UNHASHABLE:{type(v).__name__}"
                break
            kinds[c.lower()] = kind
    return kinds


def driver_strict_issues(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> list[str]:
    """Issues that would turn a locally-green key red at the driver."""
    issues: list[str] = []
    sk, ok_ = _col_kinds(spark_pdf), _col_kinds(oracle_pdf)
    for c in sorted(set(sk) | set(ok_)):
        a, b = sk.get(c), ok_.get(c)
        for side, kind in (("spark", a), ("oracle", b)):
            if kind in ("NESTED", "DECIMAL") or (
                kind is not None and kind.startswith("UNHASHABLE")
            ):
                issues.append(f"{c}: {side} side emits {kind} cells")
        if a and b and a != b and {a, b} <= {"int", "float", "bool"}:
            issues.append(f"{c}: cell-kind mismatch spark={a} oracle={b}")
    return issues


def check_query(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Run the full local parity check for one declared query."""
    spark_pdf = spark_df.toPandas()
    oracle_pdf = run_oracle(oracle_sql, sf_dir)
    issues = driver_strict_issues(spark_pdf, oracle_pdf)
    if issues:
        return False, "driver-strict: " + "; ".join(issues)
    return compare_frames(spark_pdf, oracle_pdf)
