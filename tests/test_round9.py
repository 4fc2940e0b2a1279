"""Round-9 semantic tests: sibling zip_with lambda unroll (r8 ADVICE),
plus pins for the operators added this round."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestSiblingZipWithLambdas:
    def test_pq_search_distance_table_binds_per_subspace(self, spark):
        """Regression pin for the sibling-HOF lambda-name collision
        (ext_pq_encode PITFALL, extended to ext_ann_pq_search by r8
        ADVICE): the four zip_with/aggregate instances building the
        asymmetric-distance table must each bind their OWN subspace. A
        mis-bound sibling makes approx_dist diverge from a from-scratch
        Python replay of the ADC sum for essentially every vector, so we
        replay it: codes from ext_pq_encode (independently pinned by
        TestPqEncode), distance table recomputed from the raw vectors in
        the same 9dp-rounded per-subspace form, four lookups summed in
        fixed order — and the operator's top-10 must be the global min-10
        of that replay with matching values."""
        from billing_data_loader_spark.operators.ann import _PQ_K, _PQ_M, _PQ_SUB

        emb = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load(spark, SF_DIR, "embeddings").collect()
        }
        q = emb[0]

        def sub_sqd(a, b, m):
            acc = 0.0
            for i in range(m * _PQ_SUB, (m + 1) * _PQ_SUB):
                acc = acc + (a[i] - b[i]) * (a[i] - b[i])
            return round(acc, 9)

        dt = {
            m: {c: sub_sqd(q, emb[c], m) for c in range(1, _PQ_K + 1)}
            for m in range(_PQ_M)
        }
        codes = {
            r["vec_id"]: [r[f"code_{m}"] for m in range(_PQ_M)]
            for r in catalog()["ext_pq_encode"].fn(spark, SF_DIR).collect()
        }
        replay = {
            vid: sum(dt[m][cs[m]] for m in range(_PQ_M))
            for vid, cs in codes.items()
            if vid != 0
        }
        want_top = sorted(replay, key=lambda v: (replay[v], v))[:10]

        out = catalog()["ext_ann_pq_search"].fn(spark, SF_DIR).collect()
        got = {r["vec_id"]: r["approx_dist"] for r in out}
        assert sorted(got) == sorted(want_top)
        for vid, d in got.items():
            assert math.isclose(d, replay[vid], abs_tol=1e-8), (
                f"vec {vid}: operator {d} vs replay {replay[vid]} — "
                "sibling lambda mis-binding symptom"
            )
        # the four subspace tables must actually differ (a collision
        # collapses them onto one subspace's values)
        flat = [tuple(sorted(dt[m].values())) for m in range(_PQ_M)]
        assert len(set(flat)) == _PQ_M


class TestIvfPq:
    def test_composition_equals_replay_over_probed_cells(self, spark):
        """Structural pins for the composed index (fixture recall is
        ~chance by construction — see the ext_ann_pq_search regime note):
        (a) every result's cell is one of the 8 probed cells; (b) the
        top-10 IS the min-10 of a from-scratch Python ADC replay
        restricted to probed-cell candidates — i.e. the composition
        changes WHICH vectors are scored, never HOW they are scored."""
        from billing_data_loader_spark.operators.ann import (
            _N_PIVOTS,
            _N_PROBE,
            _PQ_K,
            _PQ_M,
            _PQ_SUB,
        )

        emb = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load(spark, SF_DIR, "embeddings").collect()
        }
        q = emb[0]

        def cos(a, b):
            def dot(x, y):
                acc = 0.0
                for i in range(len(x)):
                    acc = acc + x[i] * y[i]
                return acc

            return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

        assign = {
            vid: max(
                range(1, _N_PIVOTS + 1),
                key=lambda p: (cos(v, emb[p]), -p),
            )
            for vid, v in emb.items()
        }
        probe = set(
            sorted(
                range(1, _N_PIVOTS + 1),
                key=lambda p: (-cos(emb[p], q), p),
            )[:_N_PROBE]
        )

        def sub_sqd(a, b, m):
            acc = 0.0
            for i in range(m * _PQ_SUB, (m + 1) * _PQ_SUB):
                acc = acc + (a[i] - b[i]) * (a[i] - b[i])
            return round(acc, 9)

        dt = {
            m: {c: sub_sqd(q, emb[c], m) for c in range(1, _PQ_K + 1)}
            for m in range(_PQ_M)
        }
        codes = {
            r["vec_id"]: [r[f"code_{m}"] for m in range(_PQ_M)]
            for r in catalog()["ext_pq_encode"].fn(spark, SF_DIR).collect()
        }
        replay = {
            vid: sum(dt[m][cs[m]] for m in range(_PQ_M))
            for vid, cs in codes.items()
            if vid != 0 and assign[vid] in probe
        }
        want_top = sorted(replay, key=lambda v: (replay[v], v))[:10]

        out = catalog()["ext_ann_ivfpq"].fn(spark, SF_DIR).collect()
        assert len(out) == 10
        assert sorted(r["vec_id"] for r in out) == sorted(want_top)
        for r in out:
            assert r["cell_id"] in probe
            assert r["cell_id"] == assign[r["vec_id"]]
            assert math.isclose(
                r["approx_dist"], replay[r["vec_id"]], abs_tol=1e-8
            )
            assert -1.0 <= r["cos_sim"] <= 1.0
        # pruning must be REAL on this fixture: some corpus vectors sit in
        # unprobed cells, so the candidate set is strictly smaller
        n_all = sum(1 for vid in emb if vid != 0)
        assert len(replay) < n_all


class TestPqTrain:
    def test_lloyd_step_never_increases_distortion(self, spark):
        """Trained codebook distortion (per subspace) must be <= the seed
        codebook's — Lloyd monotonicity. Seed distortion replayed in
        Python with the same 9dp rounding."""
        from billing_data_loader_spark.operators.ann import (
            _PQ_K,
            _PQ_M,
            _PQ_SUB,
        )

        emb = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load(spark, SF_DIR, "embeddings").collect()
        }

        def sqd(a, b, m):
            acc = 0.0
            for i in range(m * _PQ_SUB, (m + 1) * _PQ_SUB):
                acc = acc + (a[i] - b[i]) * (a[i] - b[i])
            return round(acc, 9)

        seed_dist = {m: 0.0 for m in range(_PQ_M)}
        for vid, v in emb.items():
            for m in range(_PQ_M):
                seed_dist[m] += min(
                    sqd(v, emb[c], m) for c in range(1, _PQ_K + 1)
                )

        out = catalog()["ext_pq_train"].fn(spark, SF_DIR).collect()
        assert len(out) == _PQ_M * _PQ_K  # no cluster emptied on fixture
        trained = {m: 0.0 for m in range(_PQ_M)}
        counts = {m: 0 for m in range(_PQ_M)}
        for r in out:
            trained[r["m"]] += r["distortion"]
            counts[r["m"]] += r["n_assigned"]
            assert len(r["centroid_csv"].split(",")) == _PQ_SUB
        n_vecs = len(emb)
        for m in range(_PQ_M):
            assert counts[m] == n_vecs
            assert trained[m] <= seed_dist[m] + 1e-6, (
                f"subspace {m}: trained {trained[m]} > seed {seed_dist[m]}"
            )
        # and the step must actually improve on this fixture, not just tie
        assert sum(trained.values()) < sum(seed_dist.values()) * 0.98


class TestEpochShuffle:
    def test_epochs_permute_completely_and_differently(self, spark):
        from billing_data_loader_spark.operators.corpus_ops import (
            _ESH_EPOCHS,
            _ESH_SHARDS,
        )

        out = catalog()["ext_epoch_shuffle"].fn(spark, SF_DIR).collect()
        n_docs = load(spark, SF_DIR, "documents").count()
        by_epoch = {}
        for r in out:
            by_epoch.setdefault(r["epoch"], []).append(r)
        assert sorted(by_epoch) == list(_ESH_EPOCHS)
        orders = {}
        for ep, rows in by_epoch.items():
            # complete coverage: every doc exactly once per epoch
            assert len(rows) == n_docs
            assert len({r["doc_id"] for r in rows}) == n_docs
            # positions contiguous from 1 within each shard
            shards = {}
            for r in rows:
                assert 0 <= r["shard"] < _ESH_SHARDS
                shards.setdefault(r["shard"], []).append(r["pos"])
            for poss in shards.values():
                assert sorted(poss) == list(range(1, len(poss) + 1))
            orders[ep] = sorted(
                (r["shard"], r["pos"], r["doc_id"]) for r in rows
            )
        # different epochs -> genuinely different reading order
        e0, e1 = (orders[ep] for ep in _ESH_EPOCHS[:2])
        assert e0 != e1
        # determinism: a second invocation is bit-identical
        again = catalog()["ext_epoch_shuffle"].fn(spark, SF_DIR).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


class TestOverlapKmv:
    def test_estimators_against_exact_truth(self, spark):
        """KMV guarantees, checked against exact set computations on the
        same gram space: union-size estimate within the k=256 error
        envelope; containment EXACT because the benchmark fits inside its
        own bottom-k sketch (|B| <= k)."""
        from billing_data_loader_spark.operators.curation import (
            _KMV_K,
            _SNIPPET,
        )

        r = (
            catalog()["ext_overlap_kmv"].fn(spark, SF_DIR).collect()[0]
        )
        docs = load(spark, SF_DIR, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 23 == 1,
                F.concat(F.col("text"), F.lit(f" {_SNIPPET}")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        t = F.split(F.col("text"), " ")
        grams = docs.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(t) >= 8,
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - 7),
                        lambda gi: F.concat_ws(" ", F.slice(t, gi, 8)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )
        a_set = {
            x["g"]
            for x in grams.filter(F.col("doc_id") % 97 != 0)
            .select("g")
            .distinct()
            .collect()
        }
        b_set = {
            x["g"]
            for x in grams.filter(F.col("doc_id") % 97 == 0)
            .select("g")
            .distinct()
            .collect()
        } | {_SNIPPET}
        true_union = len(a_set | b_set)
        # union-size: KMV std error ~ 1/sqrt(k-2) => 3-sigma ~ 19%
        assert abs(r["est_union_size"] - true_union) / true_union < 0.25
        # containment: |B| <= k makes the B-sketch exhaustive -> EXACT
        assert len(b_set) <= _KMV_K
        assert r["b_sketch_n"] == len(b_set)
        true_cont = len(a_set & b_set) / len(b_set)
        assert r["b_sketch_in_a"] == len(a_set & b_set)
        assert abs(r["est_containment"] - true_cont) < 1e-12
        # the planted snippet is the leak the estimator must see
        assert _SNIPPET in (a_set & b_set)


class TestLmBigramScore:
    def test_backoff_fires_exactly_where_the_model_is_blind(self, spark, tmp_path):
        """Planted corpus: train docs define the model; one val doc uses
        only seen unigrams in an UNSEEN order (bigram backoff), another
        contains an unseen word (double backoff). Scores replayed in
        Python to 6dp."""
        import hashlib
        import math

        from billing_data_loader_spark.operators.corpus_hygiene import (
            _BLM_ALPHA,
            _BLM_SALT,
        )

        def split_of(did):
            h = hashlib.md5(f"{did}{_BLM_SALT}".encode()).hexdigest()[0]
            return "train" if h < "c" else ("val" if h < "e" else "test")

        train_ids = [d for d in range(1, 200) if split_of(d) == "train"][:2]
        other_ids = [d for d in range(1, 200) if split_of(d) != "train"][:2]
        # train: "a b" x2 and "b a" — model knows bigrams (a,b), (b,a)
        rows = [
            (train_ids[0], "a b a b", "en", "plant", 7),
            (train_ids[1], "b a", "en", "plant", 3),
            # val/test 1: seen unigrams, unseen bigram (a,a)
            (other_ids[0], "a a", "en", "plant", 3),
            # val/test 2: unseen word z after seen a
            (other_ids[1], "a z", "en", "plant", 3),
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        out = {
            r["doc_id"]: r
            for r in catalog()["ext_lm_bigram_score"]
            .fn(spark, str(tmp_path))
            .collect()
        }
        # model: tokens a:3, b:3, N=6; bigrams (a,b):2, (b,a):2
        N = 6.0
        for did in train_ids:
            assert out[did]["split"] == "train"
            assert out[did]["n_backoff"] == 0
        # doc "a a": pos1 ln(3/6); pos2 unseen bigram -> ln(.4*3/6)
        d1 = out[other_ids[0]]
        assert d1["n_backoff"] == 1
        want = (
            round(math.log(3 / N), 6)
            + round(math.log(_BLM_ALPHA * 3 / N), 6)
        ) / 2
        assert abs(d1["avg_logprob"] - want) < 1e-5
        # doc "a z": pos1 ln(3/6); pos2 unseen word -> ln(.4*.4/6)
        d2 = out[other_ids[1]]
        assert d2["n_backoff"] == 1
        want2 = (
            round(math.log(3 / N), 6)
            + round(math.log(_BLM_ALPHA * _BLM_ALPHA / N), 6)
        ) / 2
        assert abs(d2["avg_logprob"] - want2) < 1e-5


class TestWebdatasetShards:
    def test_manifest_matches_a_real_tar_writer(self, spark):
        """The manifest's tar_bytes must equal what Python's tarfile
        actually writes (512-byte ustar headers, 512-padded payloads,
        1024-byte end-of-archive) — pinning the arithmetic to a real tar
        implementation, not just to the mirrored SQL."""
        import io
        import tarfile

        from billing_data_loader_spark.operators.multimodal import (
            _WDS_EOF,
            attach_payload,
        )

        out = catalog()["ext_webdataset_shards"].fn(spark, SF_DIR).collect()
        manifest = {(r["lang"], r["shard_id"]): r for r in out}
        docs = load(spark, SF_DIR, "documents")
        payloads = {
            r["doc_id"]: (r["lang"], bytes(r["payload"]))
            for r in attach_payload(docs, keep=("lang",)).collect()
        }
        # rebuild every shard's member list from the id ranges
        for (lang, sid), row in sorted(manifest.items()):
            members = sorted(
                did
                for did, (lg, _) in payloads.items()
                if lg == lang
                and row["first_doc_id"] <= did <= row["last_doc_id"]
            )
            assert len(members) == row["n_samples"]
            buf = io.BytesIO()
            tf = tarfile.open(
                fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
            )
            total_payload = 0
            for did in members:
                data = payloads[did][1]
                info = tarfile.TarInfo(name=f"{did}.bin")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                total_payload += len(data)
            content_bytes = tf.offset  # before end-of-archive blocks
            tf.close()
            assert total_payload == row["payload_bytes"]
            assert content_bytes + _WDS_EOF == row["tar_bytes"], (
                f"{lang}-{sid}: tarfile wrote {content_bytes + _WDS_EOF}, "
                f"manifest says {row['tar_bytes']}"
            )
        # coverage: every doc lands in exactly one shard
        assert sum(r["n_samples"] for r in out) == docs.count()

    def test_roundtrip_scan_agrees_with_manifest(self, spark):
        """scan_webdataset parses REAL tar files; per shard its members
        must reproduce the manifest exactly (count, payload byte sum, id
        range) — a mis-written shard, lost member, or wrong assignment
        breaks this equality."""
        from collections import defaultdict

        manifest = {
            r["shard_file"]: r
            for r in catalog()["ext_webdataset_shards"]
            .fn(spark, SF_DIR)
            .collect()
        }
        parsed = catalog()["scan_webdataset"].fn(spark, SF_DIR).collect()
        by_shard = defaultdict(list)
        for r in parsed:
            by_shard[r["shard_file"]].append(r)
        assert sorted(by_shard) == sorted(manifest)
        for sf_name, rows in by_shard.items():
            m = manifest[sf_name]
            assert len(rows) == m["n_samples"]
            assert sum(r["member_bytes"] for r in rows) == m["payload_bytes"]
            ids = sorted(r["doc_id"] for r in rows)
            assert ids[0] == m["first_doc_id"] and ids[-1] == m["last_doc_id"]

    def test_shard_ids_contiguous_and_ranges_disjoint(self, spark):
        out = catalog()["ext_webdataset_shards"].fn(spark, SF_DIR).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rows in by_lang.items():
            rows.sort(key=lambda r: r["shard_id"])
            assert [r["shard_id"] for r in rows] == list(range(len(rows)))
            for a, b in zip(rows, rows[1:]):
                assert a["last_doc_id"] < b["first_doc_id"]


class TestDupNgramAdaptive:
    def test_forced_paths_equal_and_fixture_picks_exact(self, spark):
        """The adaptive gate (r8 VERDICT #5) must be output-invisible:
        both forced paths produce identical rollups, and on THIS fixture
        (dup_row_frac 0.755 at sf0.01, deep in the exact regime) the
        unforced key must take the exact path — i.e. never be the slower
        plan on either regime."""
        from billing_data_loader_spark.operators.corpus_ops import (
            _DNB_REGIME_CUT,
            _dup_ngram_rollup,
        )

        bloom = sorted(
            map(tuple, _dup_ngram_rollup(spark, SF_DIR, force="bloom").collect())
        )
        exact = sorted(
            map(tuple, _dup_ngram_rollup(spark, SF_DIR, force="exact").collect())
        )
        assert bloom == exact
        adaptive = sorted(
            map(
                tuple,
                catalog()["ext_dup_ngram_bloom"].fn(spark, SF_DIR).collect(),
            )
        )
        assert adaptive == exact
        # the fixture statistic itself sits above the cut (pin the regime
        # so a fixture regeneration that flips it is caught, not silent)
        docs = load(spark, SF_DIR, "documents")
        from billing_data_loader_spark.operators.llm_pipeline import (
            _corpus_with_dups,
        )

        tri = (
            _corpus_with_dups(spark, SF_DIR)
            .select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= 3)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 2), "
                        "i -> concat_ws(' ', element_at(t, i), "
                        "element_at(t, i + 1), element_at(t, i + 2)))"
                    )
                ).alias("gs"),
            )
            .select("doc_id", F.xxhash64("gs").alias("g"))
            .distinct()
        )
        dfc = tri.groupBy("g").agg(F.count(F.lit(1)).alias("docs"))
        m = dfc.agg(
            F.sum("docs").alias("rows"),
            F.sum(
                F.when(F.col("docs") >= 2, F.col("docs")).otherwise(0)
            ).alias("dup_rows"),
        ).first()
        assert m["dup_rows"] / m["rows"] >= _DNB_REGIME_CUT
        assert docs.count() > 0


class TestSubstringDedup:
    def _planted_sf_dir(self, spark, tmp_path):
        """Tiny documents fixture: docs 1 and 2 share an exact 20-token
        run embedded in otherwise doc-unique filler; doc 3 is all-unique.
        Ids avoid doc_id % 5 == 0 so _corpus_with_dups adds no copies."""
        shared = " ".join(f"shared{i}" for i in range(20))
        texts = {
            1: " ".join(f"a{i}" for i in range(10))
            + f" {shared} "
            + " ".join(f"b{i}" for i in range(7)),
            2: " ".join(f"c{i}" for i in range(4))
            + f" {shared} "
            + " ".join(f"d{i}" for i in range(12)),
            3: " ".join(f"e{i}" for i in range(40)),
        }
        rows = [
            (did, txt, "en", "plant", len(txt)) for did, txt in texts.items()
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        return str(tmp_path), texts

    def test_planted_cross_doc_substring_found_exactly(self, spark, tmp_path):
        sf_dir, texts = self._planted_sf_dir(spark, tmp_path)
        out = (
            catalog()["ext_substring_dedup"].fn(spark, sf_dir).collect()
        )
        spans = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in out}
        # exactly the two planted docs, one maximal span each, and the
        # span is EXACTLY the shared 20-token run (W-window merge recovers
        # the full run, no bleed into the unique filler)
        assert sorted(spans) == [1, 2]
        assert len(out) == 2
        assert spans[1] == (11, 30)  # after 10 filler tokens
        assert spans[2] == (5, 24)  # after 4 filler tokens
        for r in out:
            toks = texts[r["doc_id"]].split(" ")
            got = toks[r["span_start"] - 1 : r["span_end"]]
            assert got == [f"shared{i}" for i in range(20)]
            assert r["span_tokens"] == 20

    def test_apply_operator_excises_all_occurrences(self, spark, tmp_path):
        # the DECLARED apply operator implements Lee et al.'s ExactSubstr
        # policy: every occurrence goes (both planted docs lose the run),
        # unique filler and span-free docs are byte-identical
        sf_dir, texts = self._planted_sf_dir(spark, tmp_path)
        out = {
            r["doc_id"]: r
            for r in catalog()["ext_substring_dedup_apply"]
            .fn(spark, sf_dir)
            .collect()
        }
        shared = " ".join(f"shared{i}" for i in range(20))
        assert sorted(out) == [1, 2, 3]
        for did in (1, 2):
            assert shared not in out[did]["clean_text"]
            assert out[did]["n_removed"] == 20
            want = texts[did].replace(f" {shared} ", " ")
            assert out[did]["clean_text"] == want
        assert out[3]["clean_text"] == texts[3]
        assert out[3]["n_removed"] == 0
        for did, r in out.items():
            assert r["n_kept"] + r["n_removed"] == len(texts[did].split(" "))

    def test_excision_composition_removes_planted_run(self, spark, tmp_path):
        # the downstream keep-one-copy policy: excise every span except in
        # the doc with the smallest doc_id containing the run
        sf_dir, texts = self._planted_sf_dir(spark, tmp_path)
        out = catalog()["ext_substring_dedup"].fn(spark, sf_dir).collect()
        keeper = min(r["doc_id"] for r in out)
        cleaned = {}
        for did, txt in texts.items():
            toks = txt.split(" ")
            drop = set()
            for r in out:
                if r["doc_id"] == did and did != keeper:
                    drop.update(range(r["span_start"] - 1, r["span_end"]))
            cleaned[did] = " ".join(
                t for i, t in enumerate(toks) if i not in drop
            )
        shared = " ".join(f"shared{i}" for i in range(20))
        assert shared in cleaned[keeper]
        for did in texts:
            if did != keeper:
                assert shared not in cleaned[did]
        # unique filler survives everywhere
        assert "d11" in cleaned[2] and "c3" in cleaned[2]
