"""Multimodal-column queries through the driver contract.

The driver fixtures carry no binary media, so the media column is
synthesized deterministically (text → utf-8 bytes) — which makes the
Arrow-batched mapInPandas metadata extractor *oracle-checkable*: byte size
and md5 of the utf-8 bytes are computable in DuckDB SQL. The feature
extractor's decode step is a stub per the environment contract
(operators/multimodal.py) and stays rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_bi_spark.operators.multimodal import (
    attach_media_metadata,
    extract_media_features,
)
from clinical_bi_spark.queries import query
from clinical_bi_spark.session import tune
from clinical_bi_spark.sources import load_tables

_META_ORACLE = """
SELECT
  doc_id AS asset_id,
  CASE WHEN length(text) = 0 THEN 'empty'
       ELSE 'application/octet-stream' END AS media_type,
  CAST(octet_length(encode(text)) AS INT) AS byte_size,
  CAST(NULL AS INT) AS width,
  CAST(NULL AS INT) AS height,
  md5(text) AS content_md5
FROM documents
"""


@query("multimodal_metadata", oracle=_META_ORACLE)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction (type sniff, byte size, header
    dims, content fingerprint) over Arrow-batched mapInPandas — the
    real media plumbing, driven by synthesized bytes and pinned by a
    byte-level SQL oracle (md5/octet_length agree across engines)."""
    t = load_tables(tune(spark), sf_dir)
    media = t.documents.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
    )
    return attach_media_metadata(media)


@query("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode→embed plumbing with the deterministic fake decoder (the
    container has no imaging libs — the stub contract). Rows-only; tests
    pin determinism and batch shape."""
    t = load_tables(tune(spark), sf_dir)
    media = t.documents.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
    )
    feats = extract_media_features(media, dim=16)
    # Driver contract: no raw array<float> through the boundary (the
    # driver's canonicalizer can't hash numpy arrays) — ship the vector as
    # a fixed-precision CSV string; the operator keeps the array API.
    feat_csv = F.concat_ws(
        ",", F.transform("feature", lambda x: F.format_string("%.6f", x))
    )
    return feats.select("asset_id", feat_csv.alias("feature_csv"))


# The fixture text is pure ASCII (verified: octet_length(encode(text)) ==
# length(text) for every row), so DuckDB's VARCHAR substring slices the
# same bytes Spark's binary slicing does and the md5s agree exactly.
_FRAME_ORACLE = """
SELECT doc_id AS asset_id,
       CAST(i AS INT) AS frame_index,
       md5(substring(text, CAST(i * 256 + 1 AS INT), 256)) AS frame_md5
FROM documents, UNNEST(range(0, length(text) // 256, 2)) AS t(i)
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the fake codec (256-byte frames, every 2nd
    sampled): the mapInPandas fan-out emits one row per sampled frame —
    the generator shape a real video pipeline needs — and the byte-level
    md5 oracle pins the slicing exactly. Frames ship as md5, not raw
    bytes (contract hygiene)."""
    from clinical_bi_spark.operators.multimodal import sample_video_frames

    t = load_tables(tune(spark), sf_dir)
    media = t.documents.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
    )
    frames = sample_video_frames(media, every_n=2, frame_bytes=256)
    return frames.select(
        "asset_id", "frame_index", F.md5("frame").alias("frame_md5")
    )
