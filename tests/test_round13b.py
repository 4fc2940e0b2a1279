"""Round-13 ADVICE-fix pins: churn calendar decode and greedy-coverage
degenerate rounds (ADVICE r12 items 1-2)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from billing_data_loader_spark.oracle import check_query
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import TABLE_NAMES, load

from .conftest import SF_DIR, SF_SMOKE


class TestChurnCalendarDecode:
    def test_year_month_decode_matches_orderdate(self, spark):
        """mi = year*12 + month - 1 (the win_yoy_growth convention) must
        decode so (year, month0+1) reproduces the real order calendar —
        the pre-fix 1-based encode pushed every December into the NEXT
        year with month0=0."""
        want = {
            (r["y"], r["m"])
            for r in load(spark, SF_DIR, "orders")
            .selectExpr(
                "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y",
                "CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m",
            )
            .distinct()
            .collect()
        }
        got_rows = catalog()["bill_churn_rate"].fn(spark, SF_DIR).collect()
        got = {(r["year"], r["month0"] + 1) for r in got_rows}
        assert got == want
        for r in got_rows:
            assert r["year"] == r["month_idx"] // 12
            assert r["month0"] == r["month_idx"] % 12
            assert 0 <= r["month0"] <= 11
        # the calendar must contain at least one December to make this
        # test bite (the fixture spans multiple year ends)
        assert any(m == 12 for _, m in got)


@pytest.fixture()
def tiny_corpus_dir(tmp_path):
    """A documents fixture whose gram universe exhausts in 2 greedy
    picks; every other table symlinks to the sf0.001 fixture so the
    DuckDB view registration stays valid."""
    docs = [
        (1, "a b c d e"),  # grams: {a b c, b c d, c d e} -> pick 1 (3)
        (2, "a b c d"),  # strict subset of doc 1
        (3, "b c d e"),  # strict subset of doc 1
        (4, "p q r s"),  # disjoint: {p q r, q r s} -> pick 2 (2)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["unit"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    for t in TABLE_NAMES:
        if t != "documents":
            os.symlink(
                os.path.join(SF_SMOKE, f"{t}.parquet"),
                tmp_path / f"{t}.parquet",
            )
    return str(tmp_path)


class TestCoverageGreedyDegenerate:
    def test_exhausted_universe_emits_short_pick_list(
        self, spark, tiny_corpus_dir
    ):
        """When every gram is covered before round k, BOTH engines must
        emit the short pick list (no zero-gain repeat picks)."""
        spec = catalog()["ext_coverage_gain_greedy"]
        rows = sorted(
            spec.fn(spark, tiny_corpus_dir).collect(),
            key=lambda r: r["sel_round"],
        )
        assert [(r["sel_round"], r["doc_id"], r["new_grams"]) for r in rows] == [
            (1, 1, 3),
            (2, 4, 2),
        ]
        assert rows[-1]["cum_covered"] == 5
        assert abs(rows[-1]["coverage_frac"] - 1.0) < 1e-12
        ok, msg = check_query(
            spec.fn(spark, tiny_corpus_dir), spec.oracle, tiny_corpus_dir
        )
        assert ok, msg

    def test_full_fixture_unchanged(self, spark):
        """The fixture corpus is non-degenerate: the fix must not change
        the standing 4-round output (oracle parity re-pinned)."""
        spec = catalog()["ext_coverage_gain_greedy"]
        ok, msg = check_query(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR)
        assert ok, msg
