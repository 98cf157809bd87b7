"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake behind ``use_fake=True``, ``NotImplementedError``
otherwise) — but everything Spark-side is real and tested: the schema,
the binary payload handling, the Arrow batch shapes, the UDF signatures,
and the partitioning. Swapping the stub for PIL/torchaudio changes one
inner function, not the plan.

Scale notes: media processing is embarrassingly parallel per row;
``mapInPandas`` streams Arrow batches so a 100 MB image row never
materializes more than batch-size rows at once. Keep binary columns in
their own table (joined by id) so analytic scans of the metadata never
read the bytes — column pruning keeps the media out of the scan
entirely unless asked for.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<float>, frames int"
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table, every field a pure
    **engine-portable** function of the id (md5/sha256 derivations an
    independent SQL oracle can recompute bit-for-bit): payload = 64 bytes
    of unhex(sha256(base|0) || sha256(base|1)); kind/width/height/duration
    from md5 nibbles. Generated Spark-natively; the binary column is
    exercised for real."""
    sid = F.col("id").cast("string")
    h = F.md5(F.concat(F.lit(f"media{seed}|"), sid))
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(
        kinds, (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 3 + 1)
    )
    base = F.concat(F.lit("media"), sid)
    payload_hex = F.concat(
        F.sha2(F.concat(base, F.lit("|0")), 256), F.sha2(F.concat(base, F.lit("|1")), 256)
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1920 + 16).alias("width"),
        (F.conv(F.substring(h, 9, 4), 16, 10).cast("int") % 1080 + 16).alias("height"),
        (F.conv(F.substring(h, 13, 8), 16, 10).cast("long") % 600000).alias("duration_ms"),
        F.unhex(payload_hex).alias("payload"),
    )


def extract_features(df: DataFrame, feature_dim: int = 16, use_fake: bool = True) -> DataFrame:
    """Decode → pooled feature vector via mapInPandas (Arrow batches).

    The fake path is deterministic so tests pin exact values; the plan,
    schemas and batch flow are identical to a real codec deployment.
    """

    # NB: the decode stub is re-declared INSIDE the closure so the UDF is
    # fully self-contained under cloudpickle — executors never need to
    # import this package (the driver may run from any working
    # directory; a module-global reference would pickle by-reference and
    # fail to import on the worker).
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload: bytes, kind: str) -> np.ndarray:
            if not use_fake:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "pass use_fake=True or install PIL/torchaudio/pyav"
                )
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            return arr / 255.0

        for pdf in batches:
            feats, frames, nbytes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                vec = decode(bytes(payload), kind)
                # pooled "feature": mean over feature_dim strides
                pad = (-len(vec)) % feature_dim
                v = np.pad(vec, (0, pad)).reshape(feature_dim, -1).mean(axis=1)
                feats.append(v.astype(np.float32).tolist())
                frames.append(int(len(vec) // feature_dim))
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "frames": frames,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column math (JVM-side); only the pixel
    work would live in the codec UDF. Emits target dims preserving
    aspect ratio — demonstrating metadata ops never touch the bytes."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return df.select(
        "media_id",
        "kind",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: frame timestamps as an array
    column (sequence expression, JVM-side); decode of each frame would
    join this plan to the codec UDF."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.sequence(
            F.lit(0), F.col("duration_ms"), F.lit(every_ms)
        ).alias("frame_ts_ms"),
    )
