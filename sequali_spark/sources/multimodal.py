"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride as ``binary`` columns beside a metadata struct;
decode / feature-extract stages are Arrow-batched ``mapInPandas``
transforms.  The decode libraries are not in this container, so the
decode kernel is STUBBED behind a deterministic fake (documented,
import-gated) — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested.  Sequali's analogue: BAM's
packed binary records with typed tag accessors (reference:
_qcmodule.c:5054-5259).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, mime:string>"
)

FEATURE_DIM = 32

try:  # real decoders, if the environment ever provides them
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: a seeded byte-histogram 'feature'.

    STUB: with a real imaging stack this is Image.open(...) ->
    resize(224,224) -> channel means / embedding-model features.  The
    fake is a pure function of the bytes, so tests are exact and the
    pipeline shape (binary in, float vector out) is the production one.
    """
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
    return hist / max(len(arr), 1)


def decode_features(media: DataFrame) -> DataFrame:
    """binary payload -> float feature vector, one Arrow stage.

    Real work (resize, frame-sample, spectrogram) would slot into the
    same iterator; partitioning/batch shape identical."""
    schema = "media_id string, kind string, n_bytes long, digest string, features array<float>"

    def _batches(it):
        for pdf in it:
            feats = [
                _decode_image_stub(bytes(p) if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "digest": [
                        hashlib.blake2b(
                            bytes(p) if p is not None else b"", digest_size=16
                        ).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(_batches, schema=schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp.
    The decode itself is the stub; the explode/partition shape is real —
    a doc with duration D emits ceil(D/every_ms) frame rows."""
    n_frames = F.greatest(
        F.ceil(F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministically lift the driver's documents table into the
    canonical media shape (media_id, kind, payload, meta) so the
    multimodal plumbing runs on driver-provided data: payload = utf-8
    bytes of the text (an opaque blob as far as this module is
    concerned), kind cycles image/audio/video, metadata derived from
    n_chars — all pure functions, so oracle SQL can reproduce them."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("media-"), F.col("doc_id").cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            ((F.col("n_chars") % 5000) + 500).cast("int").alias("duration_ms"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def media_kind_stats(spark, sf_dir: str) -> DataFrame:
    """Per-kind payload stats incl. distinct-payload count (the cheap
    digest tier of media dedup) — oracle-checked."""
    m = media_from_documents(spark, sf_dir)
    return (
        m.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.countDistinct(F.md5("payload")).alias("distinct_payloads"),
            F.max(F.col("meta.duration_ms")).alias("max_duration_ms"),
        )
        .orderBy("kind")
    )


def media_frame_sample_query(spark, sf_dir: str, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan over the video slice — oracle-checked: the
    explode/partition shape is the real production plan; only the pixel
    decode is the stub."""
    m = media_from_documents(spark, sf_dir)
    return (
        frame_sample(m, every_ms=every_ms)
        .select(
            "media_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
        )
        .orderBy("media_id", "frame_idx")
    )


def media_features_query(spark, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over the media table (rows-only: the
    feature kernel is the documented Python stub)."""
    m = media_from_documents(spark, sf_dir)
    feats = decode_features(m)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "digest",
        F.floor(F.lit(10000) * F.aggregate("features", F.lit(0.0), lambda a, v: a + v))
        .cast("long")
        .alias("feature_mass_bps"),
    ).orderBy("media_id")


def media_dedup_candidates(features: DataFrame, sim_threshold: float = 0.99) -> DataFrame:
    """Exact-payload dedup by digest (the cheap tier before any
    embedding similarity): groupBy digest, like text exact-dedup."""
    return (
        features.groupBy("digest")
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("keeper"))
        .filter(F.col("n_copies") >= 2)
        .orderBy(F.desc("n_copies"), "digest")
    )
