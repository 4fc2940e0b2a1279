"""Round-10 semantic tests: pins for the operators added this round plus
regression pins for the r9 ADVICE fixes (KMV not-full guard, substring
double-hash, regime-memo fingerprint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestWebdatasetIndex:
    def test_offsets_match_python_tarfile(self, spark):
        """Every index row's header_offset / data_offset / payload size
        must equal what Python's tarfile reports for the ACTUAL staged
        shard member (member.offset / member.offset_data / member.size)
        — the same ground truth the r9 tar-writer pin uses, extended
        from whole-archive byte counts to per-member positions."""
        import os
        import tarfile

        from billing_data_loader_spark.operators.multimodal import (
            _wds_staging,
        )

        idx = {
            (r["shard_file"], r["doc_id"]): r
            for r in catalog()["ext_webdataset_index"]
            .fn(spark, SF_DIR)
            .collect()
        }
        staged = _wds_staging(spark, SF_DIR)
        seen = 0
        for fname in sorted(os.listdir(staged)):
            if not fname.endswith(".tar"):
                continue
            with tarfile.open(os.path.join(staged, fname)) as tf:
                for m in tf.getmembers():
                    did = int(m.name.split(".")[0])
                    row = idx[(fname, did)]
                    assert row["header_offset"] == m.offset, (fname, did)
                    assert row["data_offset"] == m.offset_data, (fname, did)
                    assert row["payload_bytes"] == m.size, (fname, did)
                    seen += 1
        assert seen == len(idx) and seen > 0

    def test_index_is_consistent_with_manifest(self, spark):
        """Per shard: max(header_offset) + last entry_bytes + EOF blocks
        == the manifest's tar_bytes, and member count matches — the two
        declared keys describe the same physical layout."""
        from billing_data_loader_spark.operators.multimodal import _WDS_EOF

        idx = (
            catalog()["ext_webdataset_index"]
            .fn(spark, SF_DIR)
            .groupBy("shard_file")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max(
                    F.col("header_offset") + F.col("entry_bytes")
                ).alias("content_bytes"),
            )
            .collect()
        )
        man = {
            r["shard_file"]: r
            for r in catalog()["ext_webdataset_shards"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert len(idx) == len(man)
        for r in idx:
            m = man[r["shard_file"]]
            assert r["n"] == m["n_samples"]
            assert r["content_bytes"] + _WDS_EOF == m["tar_bytes"]


class TestBpeMergeTrain:
    def test_merge_sequence_equals_python_bpe_replay(self, spark):
        """The distributed trainer's merge sequence must equal a
        from-scratch single-machine Sennrich-style BPE (overlapping pair
        counts, greedy left-to-right merge apply, (count desc, pair asc)
        tie-break) on a planted vocabulary that exercises ties,
        overlapping pairs (aaa), and merges consuming earlier merges."""
        from billing_data_loader_spark.operators.segmentation import (
            _bpe_train,
        )

        planted = [
            ("banana", 10),
            ("bandana", 6),
            ("aaa", 7),
            ("naan", 5),
            ("tie1", 3),
            ("tie2", 3),
        ]
        vocab = spark.createDataFrame(planted, "word string, n_word long")

        def python_bpe(words, rounds):
            vocab = {tuple(w): n for w, n in words}
            merges = []
            for rank in range(1, rounds + 1):
                counts = {}
                for syms, n in vocab.items():
                    for i in range(len(syms) - 1):
                        p = (syms[i], syms[i + 1])
                        counts[p] = counts.get(p, 0) + n
                if not counts:
                    break
                (l, r), c = min(
                    counts.items(), key=lambda kv: (-kv[1], kv[0])
                )
                merges.append((rank, l, r, l + r, c))
                new = {}
                for syms, n in vocab.items():
                    out, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == l
                            and syms[i + 1] == r
                        ):
                            out.append(l + r)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    new[tuple(out)] = new.get(tuple(out), 0) + n
                vocab = new
            return merges

        want = python_bpe(planted, 8)
        got = _bpe_train(vocab, 8)
        assert got == want, (got, want)

    def test_declared_rounds_chain_earlier_merges(self, spark):
        """On the fixture corpus at least one declared merge must have a
        multi-char side — the trainer genuinely consumes its own earlier
        output, not six independent char-pair argmaxes."""
        rows = (
            catalog()["ext_bpe_merge_train"].fn(spark, SF_DIR).collect()
        )
        assert len(rows) == 6
        assert [r["merge_rank"] for r in rows] == [1, 2, 3, 4, 5, 6]
        assert any(
            len(r["lhs"]) > 1 or len(r["rhs"]) > 1 for r in rows
        ), rows


class TestKmvNotFullGuard:
    def test_small_corpus_estimators_turn_exact(self, spark, tmp_path):
        """ADVICE r9: with fewer than k distinct 8-grams the bottom-k IS
        the whole gram set, so est_union_size must equal the exact
        distinct-gram count and est_jaccard must divide by the actual
        sketch row count — and the oracle must agree (full check_query
        parity on the tiny corpus, exercising the not-full branch the
        sf0.01 gate never reaches)."""
        import shutil

        import pandas as pd

        from billing_data_loader_spark.oracle import check_query
        from billing_data_loader_spark.plans.catalog import catalog as cat
        from billing_data_loader_spark.tables import TABLE_NAMES

        src = "/root/testdata/sf0.001"
        sf = str(tmp_path / "tiny")
        (tmp_path / "tiny").mkdir()
        for t in TABLE_NAMES:
            shutil.copy(f"{src}/{t}.parquet", f"{sf}/{t}.parquet")
        words = [f"w{i}" for i in range(12)]
        docs = pd.DataFrame(
            {
                # 0 is the benchmark side (%97==0); 1 gets the snippet
                # appended (%23==1); 2 is plain corpus
                "doc_id": [0, 1, 2],
                "text": [
                    " ".join(words[:10]),
                    " ".join(words[1:11]),
                    " ".join(words[2:12]),
                ],
                "lang": ["en"] * 3,
                "source": ["t"] * 3,
                "n_chars": [len(" ".join(words[:10]))] * 3,
            }
        )
        docs.to_parquet(f"{sf}/documents.parquet")

        spec = cat()["ext_overlap_kmv"]
        out = spec.fn(spark, sf).collect()[0]
        # far fewer than k=256 grams: 3 from doc rows + snippet + 1 extra
        assert out["b_sketch_n"] < 256
        # exact replay: distinct grams with side flags
        grams = {}
        from billing_data_loader_spark.operators.curation import _SNIPPET

        texts = {
            0: docs.text[0],
            1: docs.text[1] + " " + _SNIPPET,
            2: docs.text[2],
        }
        for did, text in texts.items():
            t = text.split(" ")
            for i in range(len(t) - 7):
                g = " ".join(t[i : i + 8])
                a, b = grams.get(g, (0, 0))
                if did % 97 == 0:
                    b = 1
                else:
                    a = 1
                grams[g] = (max(a, grams.get(g, (0, 0))[0]),
                            max(b, grams.get(g, (0, 0))[1]))
        a, b = grams.get(_SNIPPET, (0, 0))
        grams[_SNIPPET] = (a, 1)
        n_union = len(grams)
        shared = sum(1 for (x, y) in grams.values() if x and y)
        assert n_union < 256
        assert out["est_union_size"] == float(n_union)
        assert out["sketch_shared"] == shared
        assert out["est_jaccard"] == shared / n_union
        ok, msg = check_query(spec.fn(spark, sf), spec.oracle, sf)
        assert ok, msg


class TestStagingAndMemoFingerprints:
    def test_content_addressed_stage_reuses_and_restages(self, tmp_path):
        """ADVICE r9: unchanged fixture -> staged dir reused with zero
        work; regenerated fixture -> fresh staging; stale dirs pruned."""
        import os

        from billing_data_loader_spark.sources.connectors import (
            content_addressed_stage,
        )

        sf = str(tmp_path)
        (tmp_path / "documents.parquet").write_bytes(b"v1-bytes")
        calls = []

        def stage(tmp):
            calls.append(tmp)
            with open(os.path.join(tmp, "data.bin"), "wb") as fh:
                fh.write(b"staged")

        d1 = content_addressed_stage(sf, "t_stage", stage)
        d2 = content_addressed_stage(sf, "t_stage", stage)
        assert d1 == d2 and len(calls) == 1
        assert os.path.exists(os.path.join(d1, "data.bin"))
        # regenerate the fixture (different size => different fingerprint)
        (tmp_path / "documents.parquet").write_bytes(b"v2-bytes-longer")
        d3 = content_addressed_stage(sf, "t_stage", stage)
        assert d3 != d1 and len(calls) == 2
        assert not os.path.exists(d1), "stale-fingerprint dir not pruned"

    def test_dup_ngram_regime_memo_invalidates_on_fixture_change(
        self, tmp_path
    ):
        """ADVICE r9: the bloom/exact regime memo is keyed on the corpus
        fingerprint, so a regenerated corpus at the same path gets a
        fresh probe instead of a stale plan pick."""
        from billing_data_loader_spark.operators.corpus_ops import (
            _corpus_fingerprint,
        )

        sf = str(tmp_path)
        (tmp_path / "documents.parquet").write_bytes(b"gen-one")
        fp1 = _corpus_fingerprint(sf)
        (tmp_path / "documents.parquet").write_bytes(b"gen-two--")
        fp2 = _corpus_fingerprint(sf)
        assert fp1 != fp2, "fingerprint blind to fixture regeneration"


class TestBpeSegment:
    def test_segmentation_matches_python_replay_and_reassembles(
        self, spark
    ):
        """Apply-side pin: on the planted vocabulary, the segmented
        symbol sequences must equal a Python replay that applies the
        SAME learned merges greedily in rank order — and every word must
        reassemble exactly from its symbols (no byte lost or invented by
        the anchored-replace chain)."""
        from billing_data_loader_spark.operators.segmentation import (
            _bpe_apply,
            _bpe_train,
        )

        planted = [
            ("banana", 10),
            ("bandana", 6),
            ("aaa", 7),
            ("naan", 5),
            ("tie1", 3),
            ("tie2", 3),
        ]
        vocab = spark.createDataFrame(planted, "word string, n_word long")
        merges = _bpe_train(vocab, 8)

        def segment(word):
            syms = list(word)
            for _rank, l, r, _m, _c in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l
                        and syms[i + 1] == r
                    ):
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        got = {
            r["word"]: (r["segmented"], r["n_symbols"])
            for r in _bpe_apply(vocab, merges).collect()
        }
        for word, _n in planted:
            want = segment(word)
            assert got[word] == (" ".join(want), len(want)), (word, got[word])
            assert "".join(got[word][0].split(" ")) == word

    def test_fixture_segmentation_compresses(self, spark):
        """On the fixture corpus the learned merges must strictly shrink
        the weighted symbol count vs character-level segmentation — the
        whole point of training the merges on this corpus."""
        from pyspark.sql import functions as F

        seg = catalog()["ext_bpe_segment"].fn(spark, SF_DIR)
        row = seg.agg(
            F.sum(F.col("n_word") * F.col("n_symbols")).alias("merged"),
            F.sum(F.col("n_word") * F.length("word")).alias("chars"),
        ).first()
        assert row["merged"] < row["chars"], row
        # reassembly holds corpus-wide too
        bad = seg.filter(
            F.replace(F.col("segmented"), F.lit(" "), F.lit(""))
            != F.col("word")
        ).count()
        assert bad == 0


class TestIvfpqResidual:
    def test_results_come_from_probed_cells_with_true_cosines(self, spark):
        """Structural pins (the ext_ann_ivfpq discipline): every result
        row's cell must be one of the query's nprobe nearest cells, and
        cos_sim must be the TRUE cosine for that vec_id (approximation
        lives in candidate selection + ranking, never in the reported
        similarity)."""
        from billing_data_loader_spark.operators.ann import (
            _N_PIVOTS,
            _N_PROBE,
            ext_ann_ivfpq_residual,
        )
        from billing_data_loader_spark.tables import load

        emb = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load(spark, SF_DIR, "embeddings").collect()
        }

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return num / (
                sum(x * x for x in a) ** 0.5 * sum(x * x for x in b) ** 0.5
            )

        q = emb[0]
        probed = sorted(
            range(1, _N_PIVOTS + 1), key=lambda p: (-cos(q, emb[p]), p)
        )[:_N_PROBE]
        out = ext_ann_ivfpq_residual(spark, SF_DIR).collect()
        assert len(out) == 10
        for r in out:
            assert r["cell_id"] in probed, r
            assert abs(r["cos_sim"] - cos(emb[r["vec_id"]], q)) < 1e-12


class TestSkewAqe:
    def test_runtime_plan_splits_the_skewed_partition(self, spark):
        """Execute the skewed sort-merge join under the key's AQE regime
        and assert the FINAL adaptive plan marks the join skew=true —
        the runtime split actually engaged, it isn't just configured."""
        from billing_data_loader_spark.operators.joins import (
            _skew_aqe_confs,
            _skew_aqe_joined,
        )
        from billing_data_loader_spark.session import conf_override

        with conf_override(spark, _skew_aqe_confs()):
            df = _skew_aqe_joined(spark, SF_DIR)
            df.collect()  # materialize THIS frame so AQE finalizes its plan
            plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]


class TestRuntimeBloom:
    def test_plan_plants_bloom_probe(self, spark):
        """Execute the filtered fact join under the key's runtime-filter
        regime and assert the executed plan carries BOTH halves of the
        mechanism: the dim-side bloom build (bloom_filter_agg) and the
        fact-side probe (might_contain) — the filter actually injected,
        it isn't just configured."""
        from billing_data_loader_spark.operators.joins import (
            _runtime_bloom_confs,
            _runtime_bloom_joined,
        )
        from billing_data_loader_spark.session import conf_override

        with conf_override(spark, _runtime_bloom_confs()):
            df = _runtime_bloom_joined(spark, SF_DIR)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        low = plan.lower()
        assert "might_contain" in low, plan[:2000]
        assert "bloom_filter_agg" in low, plan[:2000]

    def test_bloom_probe_is_result_neutral(self, spark):
        """The bloom probe is false-positive-only pruning: the key's
        declared aggregate must equal the plain (no-runtime-filter) join
        aggregated the same way."""
        from billing_data_loader_spark.operators.joins import (
            join_runtime_bloom,
        )
        from billing_data_loader_spark.functions.determinism import dsum

        got = {
            r["l_returnflag"]: (r["n_lines"], r["sum_price"])
            for r in join_runtime_bloom(spark, SF_DIR).collect()
        }
        li = load(spark, SF_DIR, "lineitem")
        o = load(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                dsum("l_extendedprice", "sum_price"),
            )
        )
        want = {
            r["l_returnflag"]: (r["n_lines"], r["sum_price"])
            for r in plain.collect()
        }
        assert got == want


class TestBitmapDistinct:
    def test_bitmap_equals_count_distinct(self, spark):
        """The packed-word path is EXACT: both columns must equal plain
        countDistinct computed Spark-side (independent of the DuckDB
        oracle, which proves the same thing cross-engine)."""
        from billing_data_loader_spark.operators.aggregations import (
            agg_bitmap_distinct,
        )

        got = {
            r["event_type"]: (r["n_users"], r["n_users_1997"])
            for r in agg_bitmap_distinct(spark, SF_DIR).collect()
        }
        ev = load(spark, SF_DIR, "events")
        want = {
            r["event_type"]: (r["n_all"], r["n_97"])
            for r in ev.groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("n_all"),
                F.countDistinct(
                    F.when(F.year("ts") == 1997, F.col("user_id"))
                ).alias("n_97"),
            )
            .collect()
        }
        assert got == want

    def test_partial_bitmaps_merge(self, spark):
        """Mergeability pin: per-year partial bitmaps OR-merged across the
        year axis give the same distinct count as building the bitmap over
        the union directly — the property that makes persisted bitmap
        segments re-aggregatable without raw-key re-scans."""
        ev = load(spark, SF_DIR, "events")
        words = ev.select(
            F.year("ts").alias("yr"),
            F.expr("user_id >> 5").alias("word"),
            F.expr("shiftleft(1L, int(user_id % 32))").alias("bit"),
        )
        merged = (
            words.groupBy("yr", "word")
            .agg(F.bit_or("bit").alias("bm"))
            .groupBy("word")
            .agg(F.bit_or("bm").alias("bm"))
            .select(F.sum(F.bit_count("bm")).alias("n"))
            .collect()[0]["n"]
        )
        direct = (
            words.groupBy("word")
            .agg(F.bit_or("bit").alias("bm"))
            .select(F.sum(F.bit_count("bm")).alias("n"))
            .collect()[0]["n"]
        )
        exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
        assert merged == direct == exact


class TestConcurrentUsage:
    def test_matches_brute_force_overlap(self, spark):
        """Sweep-line max equals a brute-force per-boundary overlap count
        (end-exclusive: intervals [s, e) with e == t do not cover t) on a
        bounded fixture slice."""
        from billing_data_loader_spark.operators.windows import (
            win_concurrent_usage,
        )

        got = {
            r["event_type"]: r["max_concurrent"]
            for r in win_concurrent_usage(spark, SF_DIR).collect()
        }
        rows = (
            load(spark, SF_DIR, "events")
            .select("event_type", "ts", "event_id")
            .collect()
        )
        sess: dict[str, list] = {}
        from datetime import timedelta

        for r in rows:
            dur = int(r["event_id"] % 240) + 1
            sess.setdefault(r["event_type"], []).append(
                (r["ts"], r["ts"] + timedelta(minutes=dur))
            )
        for et, ivals in sess.items():
            # concurrency can only change at a start boundary, so the max
            # is attained at some session start (end-exclusive semantics)
            best = 0
            starts = [s for s, _ in ivals]
            for t in starts:
                best = max(best, sum(1 for s, e in ivals if s <= t < e))
            assert got[et] == best, et


class TestZorderLayout:
    def test_zorder_prunes_date_box_better_than_linear(self, spark):
        """The reason to z-order at all: for the date-only box query, the
        z-layout's per-file date ranges must let the planner skip files,
        while a custkey-linear layout of the SAME file count gives every
        file the full date span (zero skipping). Strictly fewer files hit
        under z-order."""
        from billing_data_loader_spark.operators.lakeops import (
            _Z_BOX_HI,
            _Z_BOX_LO,
            _Z_EPOCH,
            _zorder_files,
            ext_zorder_layout,
        )

        idx = ext_zorder_layout(spark, SF_DIR).collect()
        z_total = len(idx)
        z_hit = sum(1 for r in idx if r["hits_date_box"])
        assert 0 < z_hit < z_total  # the box genuinely prunes

        # custkey-linear control: same row->file math with the bits
        # NOT interleaved (file = custkey bin), same file-count budget
        zed = _zorder_files(spark, SF_DIR)
        lo = F.datediff(F.lit(_Z_BOX_LO), F.lit(_Z_EPOCH))
        hi = F.datediff(F.lit(_Z_BOX_HI), F.lit(_Z_EPOCH))
        lin = (
            zed.groupBy(F.expr("ck % 64").alias("file_id"))
            .agg(
                F.min("day").alias("min_day"),
                F.max("day").alias("max_day"),
            )
            .select(
                ((F.col("min_day") <= hi) & (F.col("max_day") >= lo)).alias(
                    "hit"
                )
            )
            .collect()
        )
        lin_hit_frac = sum(1 for r in lin if r["hit"]) / len(lin)
        z_hit_frac = z_hit / z_total
        assert z_hit_frac < lin_hit_frac, (z_hit_frac, lin_hit_frac)

    def test_zorder_files_partition_the_table(self, spark):
        """The layout is a partition of the rows: per-file counts sum to
        the table count and every file_id is in the top-byte range."""
        from billing_data_loader_spark.operators.lakeops import (
            ext_zorder_layout,
        )

        idx = ext_zorder_layout(spark, SF_DIR).collect()
        total = sum(r["n_rows"] for r in idx)
        n_orders = load(spark, SF_DIR, "orders").count()
        assert total == n_orders
        assert all(0 <= r["file_id"] <= 255 for r in idx)


class TestDatasetDiff:
    def test_diff_classes_reconcile(self, spark):
        """Conservation: |A| = removed + changed + unchanged and
        |B| = added + changed + unchanged; every class is populated."""
        from billing_data_loader_spark.operators.lakeops import (
            ext_dataset_diff,
        )

        got = {
            r["status"]: r["n_docs"]
            for r in ext_dataset_diff(spark, SF_DIR).collect()
        }
        assert set(got) == {"added", "removed", "changed", "unchanged"}
        d = load(spark, SF_DIR, "documents")
        n_a = d.count()
        n_removed = d.filter(F.col("doc_id") % 17 == 0).count()
        n_added = d.filter(F.col("doc_id") % 19 == 0).count()
        assert got["removed"] == n_removed
        assert got["added"] == n_added
        assert (
            got["removed"] + got["changed"] + got["unchanged"] == n_a
        )

    def test_identical_snapshots_diff_empty(self, spark):
        """Self-diff sanity: A vs A classifies everything unchanged (the
        digest algebra, independent of the fixture perturbation)."""
        d = load(spark, SF_DIR, "documents").select(
            "doc_id", F.md5("text").alias("dig")
        )
        j = d.alias("a").join(
            d.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
        )
        n_diff = j.filter(
            F.col("a.doc_id").isNull()
            | F.col("b.doc_id").isNull()
            | (F.col("a.dig") != F.col("b.dig"))
        ).count()
        assert n_diff == 0


class TestPsiDrift:
    def test_identical_snapshots_psi_zero(self, spark):
        """PSI of a distribution against itself is exactly 0 in every
        bucket (p_ref == p_cur -> term = 0 before any quantization)."""
        from billing_data_loader_spark.functions.determinism import (
            DEFAULT_SCALE,
        )

        o = load(spark, SF_DIR, "orders").filter(
            F.year("o_orderdate") == 1997
        )
        q = o.select(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("cents")
        )
        ext = q.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
        b = q.crossJoin(F.broadcast(ext)).select(
            F.expr("CAST(((cents - mn) * 10) DIV (mx - mn + 1) AS BIGINT)").alias(
                "bucket"
            )
        )
        c = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
        rows = c.collect()
        tot = sum(r["n"] for r in rows)
        import math

        psi = sum(
            (r["n"] / tot - r["n"] / tot)
            * math.log((r["n"] / tot) / (r["n"] / tot))
            for r in rows
        )
        assert psi == 0.0
        assert DEFAULT_SCALE == 6  # the psi_term quantization contract

    def test_psi_detects_planted_shift(self, spark):
        """Sanity on the declared key: 1997 vs 1998 order prices are
        near-identically distributed in the fixture, so every psi_term is
        tiny; a deliberately shifted replica must score much larger."""
        from billing_data_loader_spark.operators.profiling import (
            prof_psi_drift,
        )

        terms = [
            r["psi_term"] for r in prof_psi_drift(spark, SF_DIR).collect()
        ]
        assert sum(abs(t) for t in terms) < 0.05  # stable corpus

        import math

        # planted shift computed locally from the same bucket counts
        rows = prof_psi_drift(spark, SF_DIR).collect()
        t_ref = sum(r["n_ref"] for r in rows)
        # shift: move 30% of bucket-0 mass to the top bucket
        cur = {r["bucket"]: r["n_ref"] for r in rows}
        lo_b = min(cur)
        hi_b = max(cur)
        moved = int(cur[lo_b] * 0.3)
        cur[lo_b] -= moved
        cur[hi_b] += moved
        psi = sum(
            (r["n_ref"] / t_ref - cur[r["bucket"]] / t_ref)
            * math.log(
                max(r["n_ref"] / t_ref, 1e-6)
                / max(cur[r["bucket"]] / t_ref, 1e-6)
            )
            for r in rows
        )
        assert psi > sum(abs(t) for t in terms)


class TestDunningAging:
    def test_bands_partition_open_orders(self, spark):
        """Band counts sum to the open-order count; band boundaries are
        end-inclusive at 30/60/90 and every band label is canonical."""
        from billing_data_loader_spark.operators.billing_analytics import (
            bill_dunning_aging,
        )

        rows = bill_dunning_aging(spark, SF_DIR).collect()
        n_open = (
            load(spark, SF_DIR, "orders")
            .filter(F.col("o_orderstatus") == "O")
            .count()
        )
        assert sum(r["n_open"] for r in rows) == n_open
        assert {r["age_band"] for r in rows} <= {
            "00-30",
            "31-60",
            "61-90",
            "90+",
        }

    def test_asof_is_max_open_order_date(self, spark):
        """The newest open order ages 0 days -> lands in 00-30; replaying
        the banding locally from the raw dates reproduces every count."""
        o = (
            load(spark, SF_DIR, "orders")
            .filter(F.col("o_orderstatus") == "O")
            .select("o_orderdate", "o_orderpriority")
            .collect()
        )
        as_of = max(r["o_orderdate"] for r in o)
        want: dict[tuple, int] = {}
        for r in o:
            age = (as_of.date() - r["o_orderdate"].date()).days
            band = (
                "00-30"
                if age <= 30
                else "31-60"
                if age <= 60
                else "61-90"
                if age <= 90
                else "90+"
            )
            want[(band, r["o_orderpriority"])] = (
                want.get((band, r["o_orderpriority"]), 0) + 1
            )
        from billing_data_loader_spark.operators.billing_analytics import (
            bill_dunning_aging,
        )

        got = {
            (r["age_band"], r["o_orderpriority"]): r["n_open"]
            for r in bill_dunning_aging(spark, SF_DIR).collect()
        }
        assert got == want


class TestCooccurrencePmi:
    def test_pmi_against_local_replay(self, spark):
        """Replay the full pipeline in plain Python on the corpus and
        compare every (pair, count, pmi) row."""
        import math

        from billing_data_loader_spark.operators.text_analysis import (
            _PMI_MIN_PAIR,
            ext_cooccurrence_pmi,
        )

        docs = load(spark, SF_DIR, "documents").select("text").collect()
        from collections import Counter

        pair_c: Counter = Counter()
        uni: Counter = Counter()
        n_pairs = 0
        n_toks = 0
        for r in docs:
            t = r["text"].split(" ")
            n_toks += len(t)
            uni.update(t)
            for i in range(len(t)):
                for o in (1, 2):
                    if i + o < len(t):
                        a, b = sorted((t[i], t[i + o]))
                        pair_c[(a, b)] += 1
                        n_pairs += 1
        want = {}
        for (a, b), c in pair_c.items():
            if c < _PMI_MIN_PAIR:
                continue
            pmi = math.log(
                (c / n_pairs) / ((uni[a] / n_toks) * (uni[b] / n_toks))
            )
            want[(a, b)] = (c, math.floor(pmi * 1e6 + 0.5) / 1e6)
        got = {
            (r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
            for r in ext_cooccurrence_pmi(spark, SF_DIR).collect()
        }
        assert got == want
        assert len(got) > 0


class TestEditDistanceNearDup:
    def test_planted_typo_found_cross_block_missed(self, spark):
        """The mechanism and its declared recall trade, both exercised:
        replay the blocked pipeline on a planted frame where one pair
        differs INSIDE the comparison prefix but OUTSIDE the blocking key
        (found) and another differs inside the blocking key (missed)."""
        from billing_data_loader_spark.operators.llm_pipeline import (
            _EDIT_BLOCK_CHARS,
            _EDIT_MAX_DIST,
        )

        base = "the quick brown fox jumps over the lazy dog again"
        typo = base[: _EDIT_BLOCK_CHARS] + "X" + base[_EDIT_BLOCK_CHARS + 1 :]
        blocked = "X" + base[1:]
        df = spark.createDataFrame(
            [(1, base, "en"), (2, typo, "en"), (3, blocked, "en")],
            ["doc_id", "text", "lang"],
        )
        d = df.select(
            "doc_id",
            "lang",
            F.substring("text", 1, _EDIT_BLOCK_CHARS).alias("blk"),
            F.substring("text", 1, 64).alias("pre"),
        )
        a, c = d.alias("a"), d.alias("c")
        got = (
            a.join(
                c,
                (F.col("a.lang") == F.col("c.lang"))
                & (F.col("a.blk") == F.col("c.blk"))
                & (F.col("a.doc_id") < F.col("c.doc_id")),
            )
            .filter(
                F.levenshtein(F.col("a.pre"), F.col("c.pre"))
                <= _EDIT_MAX_DIST
            )
            .select("a.doc_id", "c.doc_id")
            .collect()
        )
        assert {(r[0], r[1]) for r in got} == {(1, 2)}  # typo found
        # (1,3) is a 1-edit pair but blocked apart — the documented miss

    def test_fixture_has_no_capped_blocks(self, spark):
        """The oversized-block exclusion never fires on this corpus (so
        the declared output is the complete blocked candidate set)."""
        from billing_data_loader_spark.operators.llm_pipeline import (
            _EDIT_BLOCK_CHARS,
            _EDIT_MAX_BLOCK,
        )

        mx = (
            load(spark, SF_DIR, "documents")
            .groupBy("lang", F.substring("text", 1, _EDIT_BLOCK_CHARS))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert mx <= _EDIT_MAX_BLOCK

    def test_symmetric_and_thresholded(self, spark):
        """Declared pairs are canonical (doc_a < doc_b) and within the
        distance threshold; distances match Python's own Levenshtein."""
        from billing_data_loader_spark.operators.llm_pipeline import (
            _EDIT_MAX_DIST,
            _EDIT_PREFIX_CHARS,
            ext_neardup_edit_distance,
        )

        rows = ext_neardup_edit_distance(spark, SF_DIR).collect()
        assert len(rows) > 0
        assert all(r["doc_a"] < r["doc_b"] for r in rows)
        assert all(r["edit_dist"] <= _EDIT_MAX_DIST for r in rows)

        def lev(s: str, t: str) -> int:
            prev = list(range(len(t) + 1))
            for i, cs in enumerate(s, 1):
                cur = [i]
                for j, ct in enumerate(t, 1):
                    cur.append(
                        min(
                            prev[j] + 1,
                            cur[j - 1] + 1,
                            prev[j - 1] + (cs != ct),
                        )
                    )
                prev = cur
            return prev[-1]

        texts = {
            r["doc_id"]: r["text"][:_EDIT_PREFIX_CHARS]
            for r in load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        }
        for r in rows:
            assert lev(texts[r["doc_a"]], texts[r["doc_b"]]) == r["edit_dist"]


class TestStreamBitmapDistinct:
    def test_stream_equals_batch_count_distinct(self, spark):
        """The streamed bitmap rollup equals batch countDistinct per
        (hour, type) — exactness through checkpointed streaming state."""
        from billing_data_loader_spark.streaming.jobs import (
            stream_bitmap_distinct,
        )

        got = {
            (r["window_start"], r["event_type"]): r["n_users"]
            for r in stream_bitmap_distinct(spark, SF_DIR).collect()
        }
        ev = load(spark, SF_DIR, "events")
        want = {
            (r["ws"], r["event_type"]): r["n"]
            for r in ev.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
            .collect()
        }
        assert got == want

    def test_state_width_is_bounded_by_key_space(self, spark):
        """The mergeable-state claim: the streaming aggregation's rows per
        (window, type) never exceed ceil(|user space|/32) words — the
        bound that makes the state store hold words, not user ids."""
        from billing_data_loader_spark.streaming.jobs import (
            stream_bitmap_distinct,
        )

        stream_bitmap_distinct(spark, SF_DIR)  # populates the memory sink
        sink = spark.table("bdl_stream_bitmap")
        mx_users = (
            load(spark, SF_DIR, "events")
            .agg(F.max("user_id"))
            .collect()[0][0]
        )
        words_cap = mx_users // 32 + 1
        worst = (
            sink.groupBy("window_start", "event_type")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert worst <= words_cap
