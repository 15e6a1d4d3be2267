"""Real container decoding (operators/multimodal.py::decode_media_real):
the RIFF/WAVE and PPM parsers must actually read headers and sample
planes — round-tripping bytes bit-exactly through the Arrow path — and
NotImplementedError must remain ONLY for genuinely absent codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.operators import (
    multimodal as mm,
)


def test_wav_samples_round_trip_bit_exactly():
    data = bytes(range(256)) * 3 + b"\x07"  # odd length: exercises pad
    payload = mm._wav_container(data, sample_rate=44100)
    meta, samples = mm.decode_payload(payload)
    assert meta["format"] == "wav"
    assert meta["sample_rate"] == 44100
    assert meta["n_channels"] == 1 and meta["bits_per_sample"] == 8
    assert meta["n_samples"] == len(data)
    assert samples.tobytes() == data  # the actual PCM plane, bit-exact
    assert len(payload) == 44 + len(data) + 1  # RIFF pad byte


def test_wav_16bit_and_extra_chunks():
    """A 16-bit stereo WAV with a LIST chunk between fmt and data —
    the chunk walker must skip unknown chunks and honor block
    alignment."""
    pcm = np.arange(-500, 500, dtype="<i2")  # 1000 samples = 500 frames
    info = b"INFOIART" + struct.pack("<I", 4) + b"spk\x00"
    body = (
        struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 16000, 64000, 4, 16)
        + struct.pack("<4sI", b"LIST", len(info)) + info
        + struct.pack("<4sI", b"data", pcm.nbytes) + pcm.tobytes()
    )
    meta, samples = mm.decode_payload(body)
    assert meta["n_channels"] == 2 and meta["bits_per_sample"] == 16
    assert meta["n_samples"] == 500
    assert np.array_equal(samples, pcm)


def test_ppm_decode_with_comment():
    pixels = bytes(range(2 * 3 * 3))  # 2x3 RGB
    payload = b"P6\n# a comment\n3 2\n255\n" + pixels
    meta, plane = mm.decode_payload(payload)
    assert meta["format"] == "ppm"
    assert (meta["width"], meta["height"]) == (3, 2)
    assert plane.tobytes() == pixels


def test_absent_codecs_still_raise():
    with pytest.raises(NotImplementedError, match="no decoder"):
        mm.decode_payload(b"\xff\xd8\xff\xe0 jpeg-ish")
    # non-PCM WAV = genuinely absent codec too
    body = (
        struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 85, 1, 8000, 8000, 1, 8)
        + struct.pack("<4sI", b"data", 0)
    )
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_payload(body)


def test_real_decode_through_arrow_path(spark):
    """End-to-end through mapInPandas: genuine WAV containers built
    from rows, decoded by the real parser, metadata checked against
    the known construction."""
    rows = [(1, "hello world"), (2, "x" * 101), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in mm.decode_media_real(
            mm.attach_wav_payload(df, "doc_id", "text")
        ).collect()
    }
    assert out[1]["n_samples"] == 11 and out[1]["byte_len"] == 44 + 11 + 1
    assert out[2]["n_samples"] == 101 and out[2]["byte_len"] == 44 + 101 + 1
    assert out[3]["n_samples"] == 0 and out[3]["byte_len"] == 44
    assert all(
        r["format"] == "wav"
        and r["sample_rate"] == mm.WAV_SAMPLE_RATE
        and r["width"] is None
        for r in out.values()
    )
