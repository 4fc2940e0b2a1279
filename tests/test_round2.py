"""Round-2 semantic/property tests: new operators' invariants plus the
cache-scoping and config-restore hygiene contracts (VERDICT.md r1 items)."""

from __future__ import annotations

from pyspark.sql import functions as F

from billing_data_loader_spark.operators.joins import join_skew_salted
from billing_data_loader_spark.operators.projections import dedup_keep_latest
from billing_data_loader_spark.operators.reshape import agg_pivot
from billing_data_loader_spark.operators.windows import win_sessionize
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.session import conf_override
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def test_keep_latest_invariants(spark):
    """One row per key; every survivor is a genuine source row; no source
    row has a strictly higher version than its key's survivor."""
    out = dedup_keep_latest(spark, SF_DIR)
    li = load(spark, SF_DIR, "lineitem")
    n_keys = li.select("l_orderkey").distinct().count()
    assert out.count() == n_keys
    # survivors ⊆ source (exact row membership on the carried columns)
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_returnflag"]
    missing = out.join(li.select(cols), cols, "left_anti")
    assert missing.count() == 0, "keep-latest fabricated a row"
    # survivor carries its key's max version
    vmax = li.groupBy("l_orderkey").agg(F.max("l_linenumber").alias("vmax"))
    stale = out.join(vmax, "l_orderkey").filter(
        F.col("l_linenumber") < F.col("vmax")
    )
    assert stale.count() == 0, "keep-latest kept a stale version"


def test_sessionize_invariants(spark):
    """Per-user event counts are conserved; consecutive sessions of one
    user are separated by more than the 30-minute gap."""
    out = win_sessionize(spark, SF_DIR)
    ev = load(spark, SF_DIR, "events")
    per_user_out = out.groupBy("user_id").agg(
        F.sum("n_events").alias("n")
    )
    per_user_src = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    diff = per_user_out.join(per_user_src, "user_id").filter(
        per_user_out.n != per_user_src.n
    )
    assert diff.count() == 0, "sessionization lost or duplicated events"
    # session k+1 must start > 1800s after session k ends (same user)
    nxt = (
        out.alias("a")
        .join(
            out.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.session_id") == F.col("a.session_id") + 1),
        )
        .filter(
            F.col("b.session_start").cast("double")
            - F.col("a.session_end").cast("double")
            <= 1800
        )
    )
    assert nxt.count() == 0, "adjacent sessions violate the gap contract"


def test_salted_join_equals_unsalted(spark):
    """Salting is a physical rewrite only: the salted join's aggregate must
    equal the straightforward unsalted plan row-for-row."""
    salted = join_skew_salted(spark, SF_DIR)
    ev = load(spark, SF_DIR, "events")
    c = load(spark, SF_DIR, "customer")
    hot = F.when(F.col("user_id") % 10 < 8, F.lit(1)).otherwise(
        F.col("user_id")
    ).cast("long")
    plain = (
        ev.select(hot.alias("k"), "value")
        .join(c.select(F.col("c_custkey").alias("k"), "c_mktsegment"), "k")
        .groupBy("k", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_pivot_counts_conserve_total(spark):
    """Pivoted status counts sum back to the joined row total."""
    out = agg_pivot(spark, SF_DIR)
    total = out.agg(
        F.sum(F.col("n_f") + F.col("n_o") + F.col("n_p"))
    ).collect()[0][0]
    o = load(spark, SF_DIR, "orders")
    c = load(spark, SF_DIR, "customer")
    assert total == o.join(c, o.o_custkey == c.c_custkey).count()


def test_hll_self_check_green(spark):
    """The approx-distinct self-check bound holds on the fixture."""
    out = catalog()["agg_approx_distinct"].fn(spark, SF_DIR)
    assert out.filter(~F.col("hll_ok")).count() == 0


def test_scoped_caches_released_between_queries(spark):
    """A declared query's persist()s must be gone once the next declared
    query begins (VERDICT r1: CacheManager leak). Asserted RELATIVE to a
    pre-test baseline: earlier tests may leave localCheckpoint RDDs
    (e.g. ext_dedup_cluster's) whose cleanup by ContextCleaner is
    asynchronous — those are RDD-level persists outside the scoped-cache
    contract and must not flake this test."""

    def pids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()  # noqa: SLF001
        return {int(k) for k in jmap.keySet().toArray()}

    c = catalog()
    before = pids()
    c["ext_neardup_minhash_lsh"].fn(spark, SF_DIR).count()
    assert len(pids() - before) >= 1  # its own signature cache
    c["scan_parquet"].fn(spark, SF_DIR).count()
    assert not (pids() - before)


def test_conf_override_restores_unset(spark):
    """conf_override restores both explicit values and unset-ness."""
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.unset(key)
    with conf_override(spark, {key: "dynamic"}):
        assert spark.conf.get(key, None) == "dynamic"
    assert spark.conf.get(key, None) is None
    spark.conf.set(key, "dynamic")
    try:
        with conf_override(spark, {key: "static"}):
            assert spark.conf.get(key, None) == "static"
        assert spark.conf.get(key, None) == "dynamic"
    finally:
        spark.conf.unset(key)


def test_dedup_cluster_groups_planted_copies(spark):
    """Every planted copy (doc_id + 1_000_000) must land in its original's
    cluster, and cluster_id must equal the minimum member id."""
    from billing_data_loader_spark.operators.llm_pipeline import (
        _COPY_OFFSET,
        ext_dedup_cluster,
    )

    out = ext_dedup_cluster(spark, SF_DIR)
    copies = out.filter(F.col("doc_id") >= _COPY_OFFSET)
    orig = out.filter(F.col("doc_id") < _COPY_OFFSET).select(
        F.col("doc_id").alias("o_id"), F.col("cluster_id").alias("o_cluster")
    )
    misgrouped = copies.join(
        orig, copies.doc_id - _COPY_OFFSET == orig.o_id
    ).filter(F.col("cluster_id") != F.col("o_cluster"))
    assert misgrouped.count() == 0, "copy not clustered with its original"
    bad_rep = out.groupBy("cluster_id").agg(F.min("doc_id").alias("mn")).filter(
        F.col("cluster_id") != F.col("mn")
    )
    assert bad_rep.count() == 0, "cluster_id is not the min member id"


def test_seq_pack_invariants(spark):
    """Every doc binned exactly once; no bin exceeds capacity; bin count per
    language stays within the FFD guarantee (11/9 * OPT + 1). Also checks
    the declared summary query agrees with the per-doc assignments and
    asserts its own invariants (packing_ok everywhere)."""
    import math

    from billing_data_loader_spark.operators.curation import (
        _PACK_CAPACITY,
        ext_seq_pack,
        seq_pack_assignments,
    )

    out = seq_pack_assignments(spark, SF_DIR).toPandas()
    docs = load(spark, SF_DIR, "documents")
    assert len(out) == docs.count()
    assert out.doc_id.is_unique, "a doc landed in two bins"
    fills = out.groupby(["lang", "bin_id"]).n_tok.sum()
    assert (fills <= _PACK_CAPACITY).all(), "bin over capacity"
    for lang, grp in out.groupby("lang"):
        opt_lb = math.ceil(grp.n_tok.sum() / _PACK_CAPACITY)  # lower bound
        n_bins = grp.bin_id.nunique()
        assert n_bins <= math.floor(11 / 9 * opt_lb) + 1, (
            f"{lang}: {n_bins} bins vs OPT lower bound {opt_lb}"
        )

    summary = ext_seq_pack(spark, SF_DIR).toPandas().set_index("lang")
    assert summary.packing_ok.all(), "declared packing_ok flipped false"
    per_lang = out.groupby("lang").agg(
        n_docs=("doc_id", "count"), total_tok=("n_tok", "sum")
    )
    for lang, row in per_lang.iterrows():
        assert summary.loc[lang, "n_docs"] == row.n_docs
        assert summary.loc[lang, "total_tok"] == row.total_tok


def test_decontaminate_planted_leaks_flagged(spark):
    """Every doc with the planted eval snippet (doc_id % 23 == 1) must be
    flagged contaminated; benchmark docs self-overlap so they flag too."""
    from billing_data_loader_spark.operators.curation import ext_decontaminate

    out = ext_decontaminate(spark, SF_DIR)
    planted_clean = out.filter(
        (F.col("doc_id") % 23 == 1) & ~F.col("contaminated")
    )
    assert planted_clean.count() == 0, "planted leak not flagged"
    bench_clean = out.filter(F.col("is_benchmark") & ~F.col("contaminated"))
    assert bench_clean.count() == 0, "benchmark doc not self-flagged"


def test_domain_mix_flattens_sources(spark):
    """The kept mix must be flatter than the input mix: the max/min source
    ratio shrinks, and the smallest source is kept (nearly) whole."""
    from billing_data_loader_spark.operators.curation import (
        ext_domain_mix_sample,
    )

    pdf = ext_domain_mix_sample(spark, SF_DIR).toPandas()
    before = pdf.n_docs.max() / pdf.n_docs.min()
    kept = pdf[pdf.n_kept > 0]
    after = kept.n_kept.max() / kept.n_kept.min()
    assert after <= before, "temperature sampling did not flatten the mix"
    smallest = pdf.loc[pdf.n_docs.idxmin()]
    assert smallest.keep_threshold == 1_000_000, (
        "smallest source should keep everything (rate 1.0)"
    )


def test_scd2_intervals_tile(spark):
    """Per customer: exactly one open row; intervals don't overlap; each
    interval's valid_to equals the next interval's valid_from."""
    from billing_data_loader_spark.operators.billing_history import (
        scd2_history,
    )

    out = scd2_history(spark, SF_DIR)
    open_rows = out.filter(F.col("is_current")).groupBy("custkey").count()
    assert open_rows.filter(F.col("count") != 1).count() == 0
    from pyspark.sql import Window as W

    w = W.partitionBy("custkey").orderBy("valid_from")
    seq = out.withColumn("next_from", F.lead("valid_from").over(w))
    gaps = seq.filter(
        F.col("next_from").isNotNull()
        & (F.col("valid_to") != F.col("next_from"))
    )
    assert gaps.count() == 0, "intervals do not tile"
    # consecutive intervals never carry the same status (change compression)
    runs = seq.withColumn("next_status", F.lead("status").over(w)).filter(
        F.col("next_status").isNotNull()
        & (F.col("status") == F.col("next_status"))
    )
    assert runs.count() == 0, "uncompressed status run"


def test_cdc_merge_conserves_rows(spark):
    """|merged| == |base| - |deletes| + |inserts|; applied ops partition."""
    from billing_data_loader_spark.operators.billing_history import (
        cdc_merge_upsert,
    )

    base = load(spark, SF_DIR, "customer")
    out = cdc_merge_upsert(spark, SF_DIR)
    n_base = base.count()
    n_del = base.filter(F.col("c_custkey") % 11 == 3).count()
    n_ins = base.filter(F.col("c_custkey") % 13 == 0).count()
    assert out.count() == n_base - n_del + n_ins
    by_op = dict(
        out.groupBy("applied_op").count().rdd.map(tuple).collect()
    )
    assert by_op.get("I", 0) == n_ins
    assert "D" not in by_op, "deleted rows leaked into the post-image"


def test_dedup_cluster_paths_agree(spark, monkeypatch):
    """The size-gated union-find path and the distributed label-propagation
    path must produce identical (doc_id, cluster_id, cluster_size) — the
    small path is what the fixtures exercise, so the at-scale path is
    pinned against it here (round 5)."""
    from billing_data_loader_spark.operators import llm_pipeline as lp

    small = lp.ext_dedup_cluster(spark, SF_DIR).toPandas()
    spark.catalog.clearCache()
    monkeypatch.setattr(lp, "_CLUSTER_SMALL_EDGES", 0)
    large = lp.ext_dedup_cluster(spark, SF_DIR).toPandas()
    a = small.sort_values("doc_id").reset_index(drop=True)
    b = large.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_widen_scan_policy(spark):
    """widen_scan must fan a narrow frame out to the session's parallelism
    and leave an already-wide frame untouched (round 5: the no-op branch
    is what guarantees it never fires on real multi-row-group data)."""
    from billing_data_loader_spark.session import widen_scan

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    widened = widen_scan(narrow)
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == 1000
    wide = spark.range(1000).repartition(target + 7)
    assert widen_scan(wide) is wide
