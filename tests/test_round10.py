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
