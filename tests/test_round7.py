"""Round-7 additions (operators/extras.py): targeted semantics beyond the
generic oracle-parity loop in test_oracle.py (which picks these up
automatically via the catalog)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from billing_data_loader_spark.plans.catalog import catalog

from .conftest import SF_DIR


def test_sql_udf_inlines_into_plan(spark):
    # the whole point of the SQL UDF key: no Python evaluation node, the
    # CASE body participates in codegen like a hand-written expression
    plan = (
        catalog()["fn_sql_udf"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CASE WHEN" in plan


def test_hashrank_sample_is_parallelism_invariant(spark):
    # same subset at different shuffle widths — the reproducibility claim
    spec = catalog()["ext_sample_hashrank"]
    a = {
        (r["lang"], r["doc_id"])
        for r in spec.fn(spark, SF_DIR).collect()
    }
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = {
            (r["lang"], r["doc_id"])
            for r in spec.fn(spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b and len(a) > 0


def test_heavy_hitters_threshold_semantics(spark):
    rows = catalog()["agg_heavy_hitters_exact"].fn(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    # every returned user strictly exceeds n/200; nobody above is missing
    per_user = {
        r["user_id"]: r["n_events"]
        for r in ev.groupBy("user_id").count().withColumnRenamed(
            "count", "n_events"
        ).collect()
    }
    got = {r["user_id"]: r["n_events"] for r in rows}
    want = {u: c for u, c in per_user.items() if c * 200 > n}
    assert got == want


def test_win_sum_reset_resets_on_gap(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    data = [
        # one user: 2 events 10 min apart, then a 45-min gap, then 1 more
        (1, 100, t0, 1.5),
        (2, 100, t0 + timedelta(minutes=10), 2.0),
        (3, 100, t0 + timedelta(minutes=55), 4.0),
        # exactly-30-min gap is a RESET (>= semantics, matches oracle)
        (4, 200, t0, 1.0),
        (5, 200, t0 + timedelta(minutes=30), 1.0),
    ]
    import tempfile

    import pandas as pd

    # tables.load reads the footer of a single FILE at {dir}/events.parquet
    pdf = pd.DataFrame(
        data, columns=["event_id", "user_id", "ts", "value"]
    ).astype({"event_id": "int64", "user_id": "int64"})
    out = tempfile.mkdtemp(prefix="bdl_reset_toy_")
    pdf.to_parquet(f"{out}/events.parquet", index=False)
    res = {
        r["event_id"]: (r["seg"], r["running_value"])
        for r in catalog()["win_sum_reset"].fn(spark, out).collect()
    }
    assert res[1] == (1, 1.5)
    assert res[2] == (1, 3.5)   # same segment, cumulative
    assert res[3] == (2, 4.0)   # 45-min gap -> reset
    assert res[4] == (1, 1.0)
    assert res[5] == (2, 1.0)   # exactly 30 min -> reset


def test_rendezvous_minimal_disruption(spark):
    # the property that justifies the operator: growing from 8 to 9
    # shards must reassign roughly 1/9 of keys, never a wholesale move
    from billing_data_loader_spark.operators.extras import _N_SHARDS

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")

    def assign(n):
        arr = F.array(
            *[
                F.struct(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f"#{s}"))
                    ).alias("h"),
                    F.lit(s).cast("long").alias("shard"),
                )
                for s in range(n)
            ]
        )
        return {
            r["doc_id"]: r["s"]
            for r in d.select(
                "doc_id", F.array_max(arr)["shard"].alias("s")
            ).collect()
        }

    a = assign(_N_SHARDS)
    b = assign(_N_SHARDS + 1)
    moved = sum(1 for k in a if a[k] != b[k])
    frac = moved / len(a)
    # expectation 1/9 ~= 0.111; generous band for a 500-doc fixture
    assert 0.03 < frac < 0.25
    # every moved key moved TO the new shard (rendezvous invariant)
    assert all(b[k] == _N_SHARDS for k in a if a[k] != b[k])


def test_rendezvous_zero_shuffle_plan(spark):
    plan = (
        catalog()["ext_shard_rendezvous"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_semantic_rep_invariants(spark):
    rows = catalog()["ext_dedup_semantic_rep"].fn(spark, SF_DIR).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        reps = [m for m in members if m["is_rep"]]
        # exactly one representative per cluster, and everyone points at it
        assert len(reps) == 1, f"cluster {cid}: {len(reps)} reps"
        assert all(m["rep_vec_id"] == reps[0]["vec_id"] for m in members)


# --- round-7 second batch (corpus_ops / extras / profiling / lambdas) -------


def test_mg_candidates_superset_of_true_heavy_hitters(spark):
    # the Misra-Gries guarantee the operator's exactness rests on: every
    # key above the threshold must appear among the sketch candidates
    import pyspark.sql.types as T

    from billing_data_loader_spark.operators.extras import (
        _MG_K,
        _mg_candidates,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cand = {
        r["user_id"]
        for r in ev.select("user_id")
        .mapInPandas(
            _mg_candidates,
            T.StructType([T.StructField("user_id", T.LongType())]),
        )
        .collect()
    }
    n = ev.count()
    true_hh = {
        r["user_id"]
        for r in ev.groupBy("user_id")
        .count()
        .filter(F.col("count") * _MG_K > n)
        .collect()
    }
    assert true_hh, "fixture should have keys above n/_MG_K at sf0.01"
    assert true_hh <= cand
    # and the final operator output equals the exact computation
    got = {
        r["user_id"]: r["n_events"]
        for r in catalog()["agg_heavy_hitters_approx"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == true_hh


def test_dup_ngram_coverage_copies_score_one(spark):
    from billing_data_loader_spark.operators.llm_pipeline import _COPY_OFFSET

    rows = {
        r["doc_id"]: r
        for r in catalog()["ext_dup_ngram_coverage"].fn(spark, SF_DIR).collect()
    }
    copies = [r for i, r in rows.items() if i >= _COPY_OFFSET]
    assert copies, "synthetic corpus must contain re-tagged copies"
    # a verbatim copy shares every trigram with its original
    assert all(r["dup_frac"] == 1.0 for r in copies)
    for i, r in rows.items():
        assert 0.0 <= r["dup_frac"] <= 1.0 and r["n_dup"] <= r["n_shingles"]
        # the original of every copy also scores 1.0
        if i + _COPY_OFFSET in rows:
            assert rows[i]["dup_frac"] == 1.0


def test_train_split_partitions_whole_corpus(spark):
    rows = catalog()["ext_train_split_hash"].fn(spark, SF_DIR).collect()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == d.count()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    # 12/2/2 sixteenths with generous bands for a 500-doc fixture
    total = sum(by_split.values())
    assert 0.6 < by_split["train"] / total < 0.9
    assert by_split["val"] / total < 0.25
    assert by_split["test"] / total < 0.25


def test_dedup_incremental_mixes_dups_and_new(spark):
    rows = catalog()["ext_dedup_incremental"].fn(spark, SF_DIR).collect()
    from billing_data_loader_spark.operators.corpus_ops import _BATCH_OFFSET

    dups = [r for r in rows if r["is_dup"]]
    new = [r for r in rows if not r["is_dup"]]
    assert dups and new, "batch must mix genuine dups with new docs"
    for r in dups:
        # the matched corpus doc is the SAME underlying document
        assert r["matched_doc_id"] == r["batch_doc_id"] - _BATCH_OFFSET
        assert r["n_corpus_copies"] >= 1
    assert all(r["matched_doc_id"] is None for r in new)


def test_skew_report_matches_exact_counts(spark):
    rows = catalog()["prof_skew_report"].fn(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = {
        r["o_custkey"]: r["count"]
        for r in o.groupBy("o_custkey").count().collect()
    }
    assert len(rows) == 10
    top_cnt = max(exact.values())
    assert rows and max(r["cnt"] for r in rows) == top_cnt
    for r in rows:
        assert exact[r["key"]] == r["cnt"]
        want = r["cnt"] * r["n_keys"] / r["n_rows"]
        assert abs(r["skew_ratio"] - want) < 1e-12


def test_lambda_suite_plan_has_no_python_eval(spark):
    plan = (
        catalog()["fn_lambda_suite"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_rolling_slope_exact_on_linear_series(spark):
    # y = 3.5 cents/sec exactly -> every full window's slope is exactly 3.5;
    # the first event of each user (single-point window) must be NULL
    import tempfile
    from datetime import datetime, timedelta

    import pandas as pd

    t0 = datetime(2024, 3, 1, 9, 0, 0)
    rows = []
    eid = 0
    for uid in (1, 2):
        for i in range(12):
            eid += 1
            rows.append((eid, uid, t0 + timedelta(seconds=10 * i), 0.035 * 10 * i))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"]).astype(
        {"event_id": "int64", "user_id": "int64"}
    )
    out = tempfile.mkdtemp(prefix="bdl_slope_toy_")
    pdf.to_parquet(f"{out}/events.parquet", index=False)
    res = {
        r["event_id"]: r
        for r in catalog()["win_rolling_slope"].fn(spark, out).collect()
    }
    for uid_base in (0, 12):
        first = res[uid_base + 1]
        assert first["n_window"] == 1 and first["slope_c_per_s"] is None
        for k in range(2, 13):
            r = res[uid_base + k]
            assert r["n_window"] == min(k, 10)
            # value grows 0.35 units per 10 s = 35 cents / 10 s = 3.5 c/s
            assert abs(r["slope_c_per_s"] - 3.5) < 1e-12


def test_temperature_mix_flattens_toward_low_resource(spark):
    rows = (
        catalog()["ext_domain_mix_temperature"].fn(spark, SF_DIR).collect()
    )
    kept = {}
    n_dom = {}
    for r in rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
        n_dom[r["lang"]] = r["n_domain"]
        assert r["rn"] <= r["quota"]
    total_docs = sum(n_dom.values())
    total_kept = sum(kept.values())
    # largest-remainder redistribution (ADVICE r7): quotas sum EXACTLY to
    # the target whenever every quota fits its domain (true on fixtures)
    assert total_kept == 100
    # alpha=0.5 must shrink the dominant domain's share and grow the
    # smallest domain's share relative to raw proportions
    big = max(n_dom, key=n_dom.get)
    small = min(n_dom, key=n_dom.get)
    assert kept[big] / total_kept < n_dom[big] / total_docs
    assert kept[small] / total_kept > n_dom[small] / total_docs
    # every domain keeps exactly its quota (quota <= domain size here)
    for r in rows:
        assert kept[r["lang"]] == r["quota"]
