"""Multimodal-column operators (north-star mandate): image/audio/video as
opaque ``binary`` payloads + typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed:
``_decode_payload`` computes deterministic byte statistics standing in for
"decode then featurize", and the PIL/real-codec path raises
NotImplementedError behind a capability check. Everything Spark-side is
real and tested: binary schema, 4-byte magic header framing, metadata
struct, mapInPandas batch iteration, per-batch Arrow transfer, and the
SQL-oracle parity of the byte-level features.

Scale: payloads ride the scan as opaque bytes (parquet keeps them
column-compressed); mapInPandas streams batches — peak executor memory is
one Arrow batch, not one partition. Feature extraction shuffles nothing;
only the small feature frame aggregates afterwards.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

_MAGIC = b"IMG0"

#: Real-codec hook: resolved lazily; None in this container.
def _load_image_codec():
    try:  # pragma: no cover - not installed in this environment
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def attach_payload(documents: DataFrame) -> DataFrame:
    """Synthesize the multimodal frame: binary payload (magic header +
    UTF-8 bytes as the stand-in 'pixel buffer') + typed metadata struct."""
    payload = F.concat(
        F.lit(_MAGIC), F.encode("text", "UTF-8")
    ).cast("binary")
    meta = F.struct(
        F.lit("fake/img").alias("format"),
        (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
    )
    return documents.select(
        "doc_id", payload.alias("payload"), meta.alias("meta")
    )


def _decode_payload(payload: bytes) -> np.ndarray:
    """Decode stub: validates framing, returns the byte buffer. A real
    pipeline decodes pixels here; codecs are absent in this container."""
    codec = _load_image_codec()
    if codec is not None:  # pragma: no cover
        raise NotImplementedError(
            "real image decode is intentionally not wired in this build"
        )
    if payload[:4] != _MAGIC:
        raise ValueError("bad payload framing")
    return np.frombuffer(payload[4:], dtype=np.uint8)


# Feature = mean byte value (exact integer sum / count -> bit-identical to
# the SQL oracle which averages ascii codes).
_DECODE_ORACLE = """
SELECT doc_id,
       CAST(n_chars + 4 AS BIGINT) AS n_bytes,
       CAST(n_chars % 64 + 1 AS INTEGER) AS width,
       CAST(list_aggregate(list_transform(string_split(text, ''),
                                          c -> CAST(ascii(c) AS BIGINT)),
                           'sum') AS DOUBLE) / n_chars AS mean_byte
FROM documents
"""


@query("ext_multimodal_decode", oracle=_DECODE_ORACLE, tier=3)
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode + featurize via mapInPandas (batch iterator in, batch
    iterator out; decode stub over the byte buffer)."""
    frame = attach_payload(load(spark, sf_dir, "documents"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) + 4 for b in bufs],
                    "width": [m["width"] for m in pdf["meta"]],
                    "mean_byte": [
                        float(b.astype(np.int64).sum()) / len(b) for b in bufs
                    ],
                }
            )

    return frame.mapInPandas(
        decode_batches,
        "doc_id bigint, n_bytes bigint, width int, mean_byte double",
    )


# Frame sampling: every 16th byte of the payload buffer (audio/video frame
# subsampling analog) — pure byte plumbing, SQL-checkable. The sample list
# crosses the driver boundary as a CSV string (bigint->string is identical
# text on both engines; array cells crash the driver's canonicalizer).
_SAMPLE_ORACLE = """
SELECT doc_id,
       array_to_string(
         list_transform(
           range(1, CAST(len(text) AS BIGINT) + 1, 16),
           i -> CAST(ascii(text[i]) AS BIGINT)
         ), ',') AS sampled
FROM documents
"""


def frame_sample_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed variant: every 16th byte via mapInPandas. Internal-only;
    the declared query serializes the sample list to CSV."""
    frame = attach_payload(load(spark, sf_dir, "documents"))

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            samples = [
                _decode_payload(p)[::16].astype(np.int64).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sampled": samples})

    return frame.mapInPandas(sample_batches, "doc_id bigint, sampled array<bigint>")


@query("ext_frame_sample", oracle=_SAMPLE_ORACLE, tier=3)
def ext_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame-sampling stub: every 16th byte via mapInPandas."""
    arrays = frame_sample_arrays(spark, sf_dir)
    return arrays.select(
        "doc_id",
        F.array_join(
            F.transform("sampled", lambda x: x.cast("string")), ","
        ).alias("sampled"),
    )
