"""Property-based tests (hypothesis) for the cross-engine determinism
foundation, plus parallelism-independence checks.

The whole oracle-parity strategy rests on two claims:
1. decimal-quantized float reductions are reduction-order-insensitive and
   bit-identical between Spark and DuckDB (functions/determinism.py);
2. declared results do not depend on the session's shuffle width (what
   changes between local[32] and a 1000-executor cluster).
Both are asserted here on adversarial inputs, not just the fixtures.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from billing_data_loader_spark.functions.determinism import (
    dsum,
    o_dsum,
)
from billing_data_loader_spark.oracle import check_query
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.session import conf_override

from .conftest import SF_DIR

# doubles in the magnitude band the fixtures (and billing data) live in;
# decimal(28,6) quantization is only claimed for |x| < ~1e15
_VALUES = st.lists(
    st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=1,
    max_size=300,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(xs=_VALUES)
def test_dsum_matches_duckdb_bitwise(spark, xs):
    """Spark's decimal-quantized sum equals DuckDB's on arbitrary doubles,
    bit for bit — the invariant every revenue aggregate's oracle relies
    on. Spark reduces over 8 partitions (random reduction order), DuckDB
    over its own; only decimal associativity can make them agree."""
    sdf = spark.createDataFrame([(x,) for x in xs], "v double").repartition(8)
    s_val = sdf.agg(dsum("v", "s")).collect()[0]["s"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    d_val = con.execute(f"SELECT {o_dsum('v', 's')} FROM t").fetchone()[0]
    con.close()

    assert (s_val is None) == (d_val is None)
    if s_val is not None:
        assert math.isclose(s_val, d_val, rel_tol=0, abs_tol=0) or (
            s_val == d_val
        ), f"spark={s_val!r} duckdb={d_val!r}"


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, width=64
        ),
        min_size=1,
        max_size=50,
    )
)
def test_quantizer_codes_engine_free(spark, xs):
    """floor(x/s + 0.5) int8 codes (ext_embedding_quantize's quantizer)
    agree between Spark and plain Python IEEE arithmetic for any scale
    derived from the data — the tie-free property that motivated floor
    over round()."""
    from pyspark.sql import functions as F

    mx = max(abs(x) for x in xs)
    if mx == 0:
        return
    scale = mx / 127
    sdf = spark.createDataFrame([(x,) for x in xs], "v double")
    got = [
        r["c"]
        for r in sdf.select(
            F.floor(F.col("v") / scale + 0.5).cast("int").alias("c")
        ).collect()
    ]
    want = [int(math.floor(x / scale + 0.5)) for x in xs]
    assert got == want


#: keys whose plans exercise the risky reductions (float aggs, windows,
#: banding, iterative propagation) — re-checked under a different shuffle
#: width than the one they were declared at.
_WIDTH_KEYS = [
    "agg_q1_pricing",
    "agg_stats",
    "win_running_sum",
    "ext_neardup_minhash_lsh",
    "agg_incremental_merge",
]


@pytest.mark.parametrize("key", _WIDTH_KEYS)
def test_result_independent_of_shuffle_width(spark, key):
    """The declared result must not depend on parallelism: re-run under
    spark.sql.shuffle.partitions=7 (co-prime to 32, so every hash
    assignment changes) and the oracle hash must still match — the local
    stand-in for 'same answer on a 1000-executor cluster'."""
    spec = catalog()[key]
    with conf_override(spark, {"spark.sql.shuffle.partitions": "7"}):
        ok, msg = check_query(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR)
    assert ok, f"{key} under width 7: {msg}"
