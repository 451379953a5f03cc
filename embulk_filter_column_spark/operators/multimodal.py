"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns + typed metadata (the lake
treats them exactly like the CDC ``html`` column). Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` — the Spark-side
contract (schema, batch shape, partition behavior) is real and tested;
the codec itself is stubbed because no image/audio libraries ship in
this container:

* ``decoder="stub"``  → raises NotImplementedError (clearly marked seam
  where Pillow/torchaudio/ffmpeg plug in)
* ``decoder="fake"``  → deterministic hash-derived features, so the
  distributed plumbing is exercised end-to-end in tests/benchmarks
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("payload", T.BinaryType()),   # opaque encoded bytes
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def extract_features(df: DataFrame, decoder: str = "stub",
                     feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas (Arrow batch
    in, Arrow batch out; one Python worker per partition — scales with
    executors, no driver involvement)."""

    def _extract(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if decoder == "stub":
                # The real decode (PIL.Image.open / soundfile / ffmpeg)
                # goes here; not available in this environment.
                raise NotImplementedError(
                    "media decoding requires image/audio codecs not "
                    "installed in this container; use decoder='fake' for "
                    "the deterministic test path")
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(raw).digest()
                vec = np.frombuffer(
                    digest[:feature_dim * 4], dtype=np.uint32)
                feats.append(
                    (vec.astype(np.float64) / 2**32).astype(np.float32))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0),
                "feature": feats,
            })

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def fake_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows (binary payload derived from the
    id) for exercising the plumbing."""
    from pyspark.sql import functions as F

    # size partitions to the row count — spark.range defaults to one
    # partition per core, and mapInPandas pays a Python-worker round trip
    # per partition (32 near-empty Arrow batches for a 200-row table)
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 1000))
    df = spark.range(0, n, 1, n_parts)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
    payload = F.encode(
        F.concat(F.lit("media-"), F.col("id").cast("string"), F.lit("-"),
                 F.sha2(F.concat(F.col("id").cast("string"),
                                 F.lit(str(seed))), 256)), "UTF-8")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("id") * 1000).alias("duration_ms"),
    )
