"""Cross-engine deterministic aggregation helpers.

Float reductions (SUM/AVG over double) are order-sensitive: Spark's partial
aggregates and DuckDB's parallel sums reduce in different orders, so raw
double sums differ in the last bits and fail the driver's value-hash compare.

Fix, applied symmetrically on both sides: round each input to a fixed decimal
scale and sum EXACTLY in decimal arithmetic, then cast the final result back
to double. Decimal sums are associative, so both engines produce the
bit-identical double regardless of reduction order. Double->decimal casts
round identically in both engines because no IEEE double lies exactly on a
half-ulp boundary at scale >= 1 (denominator contains 5^k, not dyadic).

``dsum``/``davg`` build the Spark side; ``o_dsum``/``o_davg`` emit the
matching DuckDB SQL fragment. At 100 TB the decimal cast adds a small
constant per-row cost inside whole-stage codegen and keeps map-side partial
aggregation fully intact — it does not change the shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SCALE = 6
_DEC = "decimal(28,{s})"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive sum: decimal-quantized, returned as double."""
    return F.sum(_c(col).cast(_DEC.format(s=scale))).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive mean: exact decimal sum / non-null count."""
    c = _c(col)
    return (
        F.sum(c.cast(_DEC.format(s=scale))).cast("double") / F.count(c)
    ).alias(alias)


def o_dsum_expr(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB expression (no alias) matching :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE)"


def o_dsum(expr: str, alias: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB fragment matching :func:`dsum`."""
    return f"{o_dsum_expr(expr, scale)} AS {alias}"


def o_davg(expr: str, alias: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / COUNT(({expr}))) AS {alias}"
    )
