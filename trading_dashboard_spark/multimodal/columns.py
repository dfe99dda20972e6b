"""Multimodal columns — opaque binary payloads with typed metadata.

Extension tier (SURVEY.md §2.11 X5): image/audio/video travel through the
engine as `binary` columns plus a typed metadata struct; decode/resize/
frame-sample run as Arrow-batched `mapInPandas` stages so the heavy bytes
never pass through Python row-at-a-time and partitions stream batch by
batch.

Decode modes: `decode_media_batch(..., fake=True)` produces a
deterministic feature vector from the payload hash (stable, SQL-replicable
— what the oracle-checked queries use, since the synthesized testdata
payloads are text bytes, not media). `fake=False` runs REAL decoders:
PNG (zlib + scanline unfiltering → pixel stats) and WAV (RIFF/PCM →
sample stats) are implemented dependency-free in `codecs.py`; other
formats (JPEG/H.264/...) raise NotImplementedError naming the format,
where a PIL/ffmpeg call would slot in. The Spark-side plumbing — schema,
batching, partition behavior, UDF signatures — is identical in both modes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

#: Typed metadata carried alongside every media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media view over the `documents` testdata table.

    The container ships no real image/audio fixtures, so the multimodal
    tier is exercised against a synthesized — but fully deterministic and
    SQL-replicable — mapping of each document onto MEDIA_SCHEMA:
    payload = UTF-8 bytes of `text`, media_type cycles image/audio/video by
    `doc_id % 3`, and metadata (dimensions for images, duration for
    audio/video) derives from `n_chars`. Every downstream operator
    (metadata attach, decode, frame sampling) treats the payload as opaque
    bytes, exactly as it would real media.
    """
    mod = (F.col("doc_id") % 3).cast("int")
    is_image = mod == 0
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(mod == 0, "image").when(mod == 1, "audio").otherwise("video").alias(
            "media_type"
        ),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(is_image, (F.col("n_chars") % 640 + 16).cast("int")).alias("width"),
            F.when(is_image, (F.col("n_chars") % 480 + 16).cast("int")).alias("height"),
            F.when(~is_image, F.col("n_chars").cast("long") * 10).alias("duration_ms"),
            F.when(mod == 0, "png").when(mod == 1, "pcm").otherwise("h264").alias(
                "codec"
            ),
        ).alias("meta"),
    )


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata that needs no decode: byte length + md5."""
    p = F.col(payload_col)
    return df.withColumn("n_bytes", F.length(p).cast("long")).withColumn(
        "payload_md5", F.md5(p)
    )


def _fake_features(payload: bytes | None) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: md5 bytes → unit floats."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:_FEATURE_DIM]]


def decode_media_batch(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract stage as `mapInPandas`.

    Arrow streams partition batches through the worker; each batch is a
    pandas DataFrame with a `payload` bytes column. At scale, partition
    sizing bounds worker memory (`spark.sql.files.maxPartitionBytes`), and
    the stage is stateless so speculative retry is safe.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from .codecs import media_features  # executor-side import
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_bytes"] = pdf["payload"].map(lambda b: 0 if b is None else len(b))
            extract = _fake_features if fake else media_features
            pdf["features"] = pdf["payload"].map(extract)
            yield pdf

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (UDTF shape).

    Row expansion happens inside `mapInPandas` (batch in, larger batch
    out) — the Spark-side contract a real ffmpeg sampler would use. The
    frame payload itself is stubbed.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame_features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"]["duration_ms"] if r["meta"] is not None else 0) or 0
                n = max(1, int(dur // every_ms))
                for i in range(n):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_ms": i * every_ms,
                            "frame_features": _fake_features(
                                (r["payload"] or b"") + i.to_bytes(4, "little")
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


def audio_rms_windows(
    df: DataFrame,
    window_samples: int = 100,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Windowed audio feature extraction over REAL WAV payloads: decode
    PCM (codecs.decode_wav), cut the sample stream into fixed windows,
    emit per-window RMS + peak — the signal-processing analog of
    document chunking (one input row → n window rows).

    Arrow ``mapInPandas``: payloads stream batch-by-batch through the
    Python lane, each decoded once; multi-channel audio is averaged to
    mono before windowing. The tail window may be short (``n_samples``
    carries the actual count). Stateless and map-only — partition-size
    bounded by ``spark.sql.files.maxPartitionBytes`` at scale, safe
    under speculative retries."""
    from .codecs import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, ns, rms, peak = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, _rate = decode_wav(bytes(payload))
                mono = samples.astype(np.float64).mean(axis=1)
                for w in range(0, len(mono), window_samples):
                    win = mono[w : w + window_samples]
                    ids.append(mid)
                    widx.append(w // window_samples)
                    ns.append(len(win))
                    rms.append(float(np.sqrt(np.mean(win * win))))
                    peak.append(int(np.max(np.abs(win))))
            yield pd.DataFrame(
                {id_col: ids, "window_idx": widx, "n_samples": ns,
                 "rms": rms, "peak": peak}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} long, window_idx int, n_samples int, rms double, peak int",
    )
