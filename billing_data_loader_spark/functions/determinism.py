"""Cross-engine deterministic aggregation helpers.

Float reductions (SUM/AVG over double) are order-sensitive: Spark's partial
aggregates and DuckDB's parallel sums reduce in different orders, so raw
double sums differ in the last bits and fail the driver's value-hash compare.

Fix, applied symmetrically on both sides: round each input to a fixed decimal
scale and sum EXACTLY in decimal arithmetic, then cast the final result back
to double. Decimal sums are associative, so each engine is bit-stable under
any reduction order.

Cross-engine input-cast caveat (found by hypothesis, round 4): the two
engines' double->decimal conversions are DIFFERENT algorithms — Spark/Java
rounds the SHORTEST decimal repr (BigDecimal.valueOf) HALF_UP, DuckDB
rounds the EXACT binary expansion — so a double whose shortest repr and
exact expansion straddle a scale-6 half-boundary quantizes one ulp apart
(e.g. 140737488.52250051: exact ...5005149 -> DuckDB .522500, shortest
...50051 -> Spark .522501). This requires a ~17-significant-digit double
landing inside the repr-vs-exact gap AT a boundary: zero of 600,000 real
fixture products hit it (measured, tests/test_properties.py), every money/
rate column is decimal-born (<= 6 places, where the algorithms provably
coincide), and all 160+ oracle hashes bind bitwise in practice. If a
fixture regeneration ever surfaces the corner, the documented migration is
floor-based quantization — sum(CAST(floor(x*1e6 + 0.5) AS BIGINT))/1e6 —
whose multiply/add/floor are identical IEEE ops in both engines with no
decimal conversion at all (it changes every oracle string, hence deferred
to a round boundary).

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


def _scaled(col: Column, scale: int) -> Column:
    """Tie-free integer quantization: floor(x * 10^scale + 0.5) as a LONG.

    multiply/add/floor are single IEEE-754 ops computed identically by
    both engines — no double->decimal conversion anywhere, which removes
    the HALF_UP-vs-half-even repr corner the decimal-cast form carried
    (module docstring). The long is summed as decimal(38,0): bare bigint
    sums overflow past ~9e7 rows/group at 1e11-per-row magnitudes, the
    decimal accumulator never does (and accepting longs, it skips the
    per-row Decimal allocation the old double->decimal(28,6) cast paid —
    measured 2x faster over 600k rows)."""
    return F.floor(col.cast("double") * float(10**scale) + F.lit(0.5))


def divisor(scale: int = DEFAULT_SCALE) -> float:
    """The float divisor that undoes :func:`quantize_long` at ``scale``.

    Call sites that reconstruct money from quantized integer units MUST
    derive the divisor from the same scale they quantized with — a
    hardcoded ``/ 1000000.0`` next to ``quantize_long(col)`` silently
    couples the pair to ``DEFAULT_SCALE == 6`` and desyncs without error
    if the scale ever changes."""
    return float(10**scale)


#: Divisor matching ``quantize_long`` at DEFAULT_SCALE (micro-units).
MICRO = divisor(DEFAULT_SCALE)


def quantize_long(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Public form of :func:`_scaled` for operators that carry quantized
    integer units through joins/windows/state before the final sum (the
    streaming micro-unit pattern, incremental-rollup partials)."""
    return _scaled(_c(col), scale)


def dsum_col(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Bare-column (no alias) form of :func:`dsum`, for call sites that
    compose the sum into larger expressions."""
    return F.sum(_scaled(_c(col), scale).cast("decimal(38,0)")).cast(
        "double"
    ) / float(10**scale)


def dsum(col: Column | str, alias: str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive sum: floor-quantized integer sum, as double."""
    return dsum_col(col, scale).alias(alias)


def davg(col: Column | str, alias: str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive mean: floor-quantized sum / non-null count."""
    c = _c(col)
    return (dsum_col(c, scale) / F.count(c)).alias(alias)


def dsum_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """Spark-SQL text form of :func:`dsum_col` (no alias), for queries
    declared as SQL strings — the same ops :func:`dsum` plans, so it stays
    bit-matched to :func:`o_dsum_expr`. Spark's FLOOR(DOUBLE) returns
    BIGINT directly; the value is IEEE-identical to DuckDB's double floor."""
    m = float(10**scale)
    return (
        f"(CAST(SUM(CAST(FLOOR(CAST(({expr}) AS DOUBLE) * {m!r} + 0.5)"
        f" AS DECIMAL(38,0))) AS DOUBLE) / {m!r})"
    )


def o_dsum_expr(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB expression (no alias) matching :func:`dsum`: the identical
    IEEE multiply/add/floor per row, summed in DECIMAL(38,0), cast to
    double, then the identical double division."""
    m = float(10**scale)
    return (
        f"(CAST(SUM(CAST(floor(CAST(({expr}) AS DOUBLE) * {m!r} + 0.5)"
        f" AS DECIMAL(38,0))) AS DOUBLE) / {m!r})"
    )


def o_dsum(expr: str, alias: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB fragment matching :func:`dsum`."""
    return f"{o_dsum_expr(expr, scale)} AS {alias}"


def o_davg(expr: str, alias: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return f"({o_dsum_expr(expr, scale)} / COUNT(({expr}))) AS {alias}"
