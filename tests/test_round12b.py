"""Round-12 ADVICE closures for ``ext_neardup_incremental``
(operators/llm_pipeline.py):

1. *Banding recall is pinned structurally, not just empirically per
   fixture*: the key's exact batch x corpus Jaccard oracle only holds if
   the 32x2 MinHash banding surfaces EVERY >= 0.6 pair as a candidate.
   ``test_banding_recall_exhaustive`` enumerates all such pairs with an
   exact DuckDB shingle join and asserts each one lands in the banding
   candidate set, at BOTH sf0.01 (the driver's correctness tier) and
   sf0.1 (the bench tier) — so a recall regression (fixture regeneration,
   band-parameter edit, hash-seed drift) breaks this test before it can
   silently ride on per-fixture luck.

2. *The _INC_OFFSET id-range split is checked, not assumed*: the Spark
   side separates batch from corpus signatures by ``doc_id < _INC_OFFSET``
   after the shared one-pass signature build; a corpus doc_id above the
   offset would silently merge into the batch side.
   ``test_inc_offset_bounds`` pins ``max(corpus doc_id) + _INC_OFFSET``
   overflow-free ordering at every fixture tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from billing_data_loader_spark.operators.llm_pipeline import (
    _BAND_SIZE,
    _INC_BATCH_SQL,
    _INC_OFFSET,
    _N_HASHES,
    _hashed_shingle_tokens,
)
from billing_data_loader_spark.oracle import run_oracle
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR

SF_BENCH = "/root/testdata/sf0.1"

#: Exact >= 0.6 batch x corpus pairs — the ``jac`` prefix of the key's
#: oracle (same batch synthesis via the shared _INC_BATCH_SQL), stopped
#: before the best-match fold so EVERY qualifying pair is enumerated,
#: not only each batch doc's winner.
_EXACT_PAIRS_SQL = f"""
WITH batch AS ({_INC_BATCH_SQL}),
btoks AS (SELECT batch_id, lang, string_split(text, ' ') AS t FROM batch),
btok AS (
  SELECT DISTINCT batch_id, lang,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
           AS token
  FROM btoks
),
ctoks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
ctok AS (
  SELECT DISTINCT doc_id, lang,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
           AS token
  FROM ctoks
),
bsz AS (SELECT batch_id, COUNT(*) AS bn FROM btok GROUP BY batch_id),
csz AS (SELECT doc_id, COUNT(*) AS cn FROM ctok GROUP BY doc_id),
pairs AS (
  SELECT b.batch_id, c.doc_id, COUNT(*) AS n_common
  FROM btok b JOIN ctok c ON b.token = c.token AND b.lang = c.lang
  GROUP BY b.batch_id, c.doc_id
)
SELECT batch_id, doc_id
FROM pairs JOIN bsz USING (batch_id) JOIN csz USING (doc_id)
WHERE CAST(n_common AS DOUBLE) / (bn + cn - n_common) >= 0.6
"""


def _banding_candidates(spark, sf_dir):
    """Replica of the key's candidate-generation prefix: same one-pass
    signature build over corpus UNION batch, same xxhash64 seeds, same
    band signature construction, same id-range split.  Parameters are
    imported from the module, so a band/hash-count edit propagates here
    and recall is re-checked against the new geometry."""
    d = load(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 9 <= 2).select(
        (F.col("doc_id") + _INC_OFFSET).alias("doc_id"),
        F.expr(
            "CASE doc_id % 9"
            " WHEN 0 THEN regexp_replace(text, '^[^ ]+ ', '')"
            " WHEN 1 THEN text"
            " ELSE concat_ws(' ', reverse(split(text, ' '))) END"
        ).alias("text"),
        "lang",
    )
    tok = _hashed_shingle_tokens(
        d.select("doc_id", "text", "lang").unionAll(batch), distinct=False
    )
    sig = tok.groupBy("doc_id", "lang").agg(
        *[
            F.min(F.xxhash64("th", F.lit(s))).alias(f"h{s}")
            for s in range(_N_HASHES)
        ]
    )
    n_bands = _N_HASHES // _BAND_SIZE
    band_sigs = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ":",
                    F.lit(str(b)),
                    *[
                        F.col(f"h{b * _BAND_SIZE + r}")
                        for r in range(_BAND_SIZE)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        "doc_id", "lang", F.posexplode(band_sigs).alias("band", "band_sig")
    )
    cbands = banded.filter(F.col("doc_id") < _INC_OFFSET).select(
        F.col("doc_id").alias("corpus_id"), "lang", "band", "band_sig"
    )
    bbands = banded.filter(F.col("doc_id") >= _INC_OFFSET).select(
        F.col("doc_id").alias("batch_id"), "lang", "band", "band_sig"
    )
    return (
        cbands.join(F.broadcast(bbands), ["lang", "band", "band_sig"])
        .select("batch_id", "corpus_id")
        .distinct()
    )


class TestIncNeardupAdvice:
    def test_inc_offset_bounds(self, spark):
        for sf in ("/root/testdata/sf0.001", SF_DIR, SF_BENCH):
            mx = (
                load(spark, sf, "documents")
                .agg(F.max("doc_id").alias("m"))
                .first()["m"]
            )
            assert mx < _INC_OFFSET, (
                f"{sf}: max doc_id {mx} >= _INC_OFFSET {_INC_OFFSET} — "
                "the id-range batch/corpus split would merge signatures"
            )

    def test_banding_recall_exhaustive(self, spark):
        for sf in (SF_DIR, SF_BENCH):
            exact = {
                (int(r.batch_id), int(r.doc_id))
                for r in run_oracle(_EXACT_PAIRS_SQL, sf).itertuples(
                    index=False
                )
            }
            assert exact, f"{sf}: fixture lost its planted >=0.6 pairs"
            got = {
                (r["batch_id"], r["corpus_id"])
                for r in _banding_candidates(spark, sf).collect()
            }
            missed = exact - got
            assert not missed, (
                f"{sf}: banding missed {len(missed)} of {len(exact)} "
                f"exact >=0.6 pairs, e.g. {sorted(missed)[:5]}"
            )
