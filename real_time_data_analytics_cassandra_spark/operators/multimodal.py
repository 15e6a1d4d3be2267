"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as opaque ``binary``
columns with typed metadata alongside; decode / feature-extraction /
frame-sampling run as Arrow-batched pandas stages (``mapInPandas``) so
each executor processes whole record batches without per-row Python
overhead.

The actual media codecs are NOT available in this environment, so the
decode step is a clearly-marked STUB: ``decode_media_meta`` computes a
deterministic fake (metadata derived arithmetically from the payload
bytes), and ``decode_media_real`` raises NotImplementedError where a
real decoder (PIL/ffmpeg/torchaudio) would plug in.  Everything
Spark-side — schema handling, Arrow batching, partition parallelism,
the UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a media blob column: utf-8 bytes of the text.

    Real pipelines read the blob from object storage / a parquet binary
    column; the deterministic derivation keeps tests reproducible.
    """
    from real_time_data_analytics_cassandra_spark.catalog import spread

    return spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a media decoder (STUB).

    A real implementation would parse container headers; we derive
    plausible metadata from the byte length so the oracle can verify
    the full Spark plumbing end-to-end.
    """
    byte_len = batch["payload"].map(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].astype("int64"),
            "byte_len": byte_len,
            "width": byte_len % 640,
            "height": (byte_len * 31) % 480,
            "n_frames": byte_len % 16,
        }
    )


def decode_media_meta(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield _fake_decode(batch)

    return df_with_payload.mapInPandas(run, schema=DECODED_META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_byte_offset", LongType()),
    ]
)


def frame_sample(df_with_payload: DataFrame) -> DataFrame:
    """Frame sampling over video-like payloads: one output row per
    sampled frame (1:N Arrow-batched expansion via mapInPandas).

    The frame count and offsets come from the deterministic stub
    decoder (byte_len-derived, see module docstring); a real
    implementation would read container frame indexes.  Payloads with
    zero frames produce no rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            meta = _fake_decode(batch)
            n = meta["n_frames"].to_numpy()
            reps = n.clip(min=0)
            doc_ids = meta["doc_id"].to_numpy().repeat(reps)
            byte_len = meta["byte_len"].to_numpy().repeat(reps)
            n_rep = n.repeat(reps)
            frame_idx = np.concatenate(
                [np.arange(k, dtype="int64") for k in reps]
            ) if len(reps) else np.array([], dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids.astype("int64"),
                    "frame_idx": frame_idx,
                    "frame_byte_offset": (frame_idx * (byte_len // n_rep)).astype(
                        "int64"
                    ),
                }
            )

    return df_with_payload.mapInPandas(run, schema=FRAME_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(df_with_payload: DataFrame) -> DataFrame:
    """Feature extraction over the binary column: a normalized
    16-bucket byte histogram per payload (the deterministic stand-in
    for an image/audio embedding model — same Arrow-batched shape a
    model inference stage would use; swap ``_histogram`` for the model
    call).  Vectorized: one frombuffer + bincount per payload, no
    per-byte Python."""

    def _histogram(payload: bytes) -> list[float]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * FEATURE_DIM
        counts = np.bincount(arr >> 4, minlength=FEATURE_DIM)
        return (counts / arr.size).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "features": batch["payload"].map(_histogram),
                }
            )

    return df_with_payload.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_media_real(df_with_payload: DataFrame) -> DataFrame:
    """Where a real decoder would go (PIL / ffmpeg / torchaudio).

    Raises:
        NotImplementedError: media codec libraries are not available
        in this environment (see module docstring).
    """
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in this "
        "environment; use decode_media_meta (deterministic stub) instead"
    )


AUDIO_WINDOW = 1024

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_window_features(df_with_payload: DataFrame) -> DataFrame:
    """Audio-style windowed features over the binary column: the
    payload is treated as 8-bit PCM (bytes centered at 128), cut into
    fixed AUDIO_WINDOW-byte frames (tail window kept), and each frame
    yields RMS energy + zero-crossing count — the canonical first
    stage of an audio-curation pipeline (silence/clipping filters,
    VAD features).

    Real resampling/codec work would replace the byte interpretation
    (STUB, same contract as ``decode_media_meta``); the pipeline
    shape — 1:N Arrow-batched window expansion, numpy math per batch,
    no per-row Python — is the production one.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            out_ids, out_idx, out_rms, out_zc = [], [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                samples = (
                    np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                    - 128.0
                )
                if samples.size == 0:
                    continue
                n_win = (samples.size + AUDIO_WINDOW - 1) // AUDIO_WINDOW
                for w in range(n_win):
                    frame = samples[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
                    out_ids.append(doc_id)
                    out_idx.append(w)
                    out_rms.append(
                        round(float(np.sqrt(np.mean(frame * frame))), 6)
                    )
                    signs = np.signbit(frame[frame != 0.0])
                    out_zc.append(int(np.count_nonzero(signs[1:] != signs[:-1])))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "window_idx": pd.Series(out_idx, dtype="int64"),
                    "rms": pd.Series(out_rms, dtype="float64"),
                    "zero_crossings": pd.Series(out_zc, dtype="int64"),
                }
            )

    return df_with_payload.mapInPandas(run, schema=AUDIO_SCHEMA)
