"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as opaque ``binary``
columns with typed metadata alongside; decode / feature-extraction /
frame-sampling run as Arrow-batched pandas stages (``mapInPandas``) so
each executor processes whole record batches without per-row Python
overhead.

Compressed-codec libraries (PIL/ffmpeg/torchaudio) are NOT available
in this environment, so ``decode_media_meta`` computes a deterministic
fake for arbitrary payloads — but ``decode_media_real`` DOES decode
three dependency-free containers end-to-end: RIFF/WAVE PCM audio
(chunk-walking header parse + sample extraction), binary PPM (P6)
images, and PNG (stdlib-zlib inflate, per-chunk
CRC32 verification, full defiltering of all five spec filter types —
a genuinely COMPRESSED codec, across the complete static-image
spec surface: every legal color-type/bit-depth combination, palette
via the CRC-checked PLTE table, sequential and Adam7 interlaced).
Payloads in any other container (JPEG/MP3) raise NotImplementedError —
that boundary now means "codec genuinely absent", not "no decoder
exists".  Everything Spark-side — schema handling, Arrow batching,
partition parallelism, the UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
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


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, parallelize: bool = True
) -> DataFrame:
    """Simulate a media blob column: utf-8 bytes of the text.

    Real pipelines read the blob from object storage / a parquet binary
    column; the deterministic derivation keeps tests reproducible.

    ``parallelize=False`` skips the spread() repartition for consumers
    whose downstream stage is O(1) per blob (header-peek metadata): the
    round-robin exchange moves EVERY payload byte, so for those stages
    the shuffle costs more than the work at any corpus size — on a
    production corpus the scan arrives in many splits and parallelism
    is already there without an exchange.  CPU-bound decoders (pixel
    defilter, feature folds) keep the default spread.
    """
    from real_time_data_analytics_cassandra_spark.catalog import spread

    src = spread(df) if parallelize else df
    return src.select(
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


WAV_SAMPLE_RATE = 8000

REAL_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("n_samples", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("byte_len", LongType()),
    ]
)


def _wav_container(data: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """A genuine RIFF/WAVE file holding ``data`` as unsigned 8-bit
    mono PCM (44-byte canonical header; odd-sized data chunks get the
    RIFF pad byte)."""
    import struct

    n = len(data)
    pad = n % 2
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + n + pad,
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 1 * 1,  # byte rate
        1,  # block align
        8,  # bits per sample
        b"data",
        n,
    )
    return header + data + (b"\x00" * pad)


def _decode_wav(payload: bytes) -> tuple[dict, np.ndarray]:
    """Chunk-walking RIFF/WAVE PCM parse: returns (metadata dict,
    samples as numpy).  Handles extra chunks (LIST etc.) by skipping;
    rejects non-PCM encodings."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        if pos + 8 + size > len(payload):
            # a lying size field would silently truncate the sample
            # plane (or crash the fmt unpack) — raise a typed error
            raise ValueError(f"truncated WAV chunk {cid!r}")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk shorter than 16 bytes")
            (audio_fmt, channels, rate, _br, _ba, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV audio format {audio_fmt} needs a codec library; "
                    "only PCM (1) decodes here"
                )
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are even-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, bits = fmt
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    meta = {
        "format": "wav",
        "n_channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": samples.size // channels,
        "width": None,
        "height": None,
    }
    return meta, samples


def _decode_ppm(payload: bytes) -> tuple[dict, np.ndarray]:
    """Binary PPM (P6) parse: header tokens (width, height, maxval)
    with comment handling, then the raw RGB plane."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    pos, tokens_out = 2, []
    while len(tokens_out) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens_out.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens_out
    if width <= 0 or height <= 0 or maxval <= 0:
        raise ValueError("non-positive PPM header dimensions")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM planes not supported")
    # Over-declared dims (including width*height overflow attempts)
    # would otherwise silently shorten the plane slice — hostile
    # crawl bytes must raise, not truncate.
    if len(payload) - pos < width * height * 3:
        raise ValueError("truncated PPM pixel plane")
    pixels = np.frombuffer(
        payload[pos : pos + width * height * 3], dtype=np.uint8
    )
    meta = {
        "format": "ppm",
        "n_channels": 3,
        "sample_rate": None,
        "bits_per_sample": 8,
        "n_samples": None,
        "width": width,
        "height": height,
    }
    return meta, pixels


PNG_WIDTH = 64
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (spec §9.4): nearest of left/up/up-left
    to a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_filter_plane(
    plane: bytes, row_bytes: int, height: int, bpp: int = 1
) -> bytes:
    """Apply the five PNG scanline filters CYCLING by row (None/Sub/
    Up/Average/Paeth, spec §9) over a packed plane of ``height`` rows
    of ``row_bytes`` bytes each.  Filtering is byte-oriented per spec
    with the left neighbor ``bpp`` bytes back, where bpp =
    max(1, bits·channels/8): 1 for 8-bit grayscale and ANY sub-8-bit
    packed image, 2 for 16-bit grayscale."""
    prev = bytes(row_bytes)
    filtered = bytearray()
    for r in range(height):
        row = plane[r * row_bytes : (r + 1) * row_bytes]
        ft = r % 5
        filtered.append(ft)
        if ft == 0:
            filtered += row
        elif ft == 1:  # Sub
            filtered += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(row_bytes)
            )
        elif ft == 2:  # Up
            filtered += bytes(
                (row[i] - prev[i]) & 0xFF for i in range(row_bytes)
            )
        elif ft == 3:  # Average
            filtered += bytes(
                (
                    row[i]
                    - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)
                )
                & 0xFF
                for i in range(row_bytes)
            )
        else:  # Paeth
            filtered += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(row_bytes)
            )
        prev = row
    return bytes(filtered)


def _png_assemble(ihdr: bytes, filtered: bytes, plte: bytes = b"") -> bytes:
    """Chunk assembly shared by the container builders: IHDR [+PLTE],
    the zlib stream split across TWO IDAT chunks (decoders must
    really concatenate), IEND."""
    import zlib

    idat = zlib.compress(filtered)
    mid = len(idat) // 2
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte:
        out += _png_chunk(b"PLTE", plte)
    if mid:
        out += _png_chunk(b"IDAT", idat[:mid]) + _png_chunk(
            b"IDAT", idat[mid:]
        )
    else:
        out += _png_chunk(b"IDAT", idat)
    return out + _png_chunk(b"IEND", b"")


def _png_container(data: bytes, width: int = PNG_WIDTH) -> bytes:
    """A GENUINE PNG file holding ``data`` as an 8-bit grayscale image
    of fixed ``width`` (final row zero-padded; empty input becomes one
    blank row), written with stdlib zlib only.  Scanline filter types
    CYCLE through all five spec filters (None/Sub/Up/Average/Paeth)
    and the zlib stream is split across TWO IDAT chunks, so a decoder
    only recovers the pixels by doing real defiltering and multi-IDAT
    concatenation — any PNG viewer opens the output."""
    import struct

    height = max(1, -(-len(data) // width))
    plane = data + b"\x00" * (width * height - len(data))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return _png_assemble(ihdr, _png_filter_plane(plane, width, height))


def _png_container_gray16(data: bytes, width: int = PNG_WIDTH) -> bytes:
    """A GENUINE 16-BIT GRAYSCALE PNG (color type 0, depth 16)
    holding ``data`` as big-endian sample bytes: each PAIR of input
    bytes becomes one 16-bit sample (the spec's network byte order),
    so the decoder's two-byte unpacking and bpp=2 defiltering paths
    run for real.  Same cycling scanline filters and two-IDAT split
    as :func:`_png_container`; rows hold ``width`` samples = 2·width
    bytes, final row zero-padded, empty input becomes one blank
    row."""
    import struct

    row_bytes = width * 2
    height = max(1, -(-len(data) // row_bytes))
    plane = data + b"\x00" * (row_bytes * height - len(data))
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 0, 0, 0, 0)
    return _png_assemble(
        ihdr, _png_filter_plane(plane, row_bytes, height, bpp=2)
    )


def _png_container_rgba(data: bytes, width: int = PNG_WIDTH) -> bytes:
    """A GENUINE 8-BIT RGBA PNG (color type 6, depth 8) holding
    ``data`` as interleaved R,G,B,A sample bytes: each group of four
    input bytes becomes one pixel, so the decoder's 4-channel
    interleaving and bpp=4 defiltering (left neighbor four bytes
    back) run for real.  Same cycling scanline filters and two-IDAT
    split as :func:`_png_container`; rows hold ``width`` pixels =
    4·width bytes, final row zero-padded, empty input becomes one
    blank row."""
    import struct

    row_bytes = width * 4
    height = max(1, -(-len(data) // row_bytes))
    plane = data + b"\x00" * (row_bytes * height - len(data))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return _png_assemble(
        ihdr, _png_filter_plane(plane, row_bytes, height, bpp=4)
    )


def _png_container_palette(data: bytes, width: int = PNG_WIDTH) -> bytes:
    """A GENUINE 4-BIT PALETTE PNG (color type 3, depth 4) holding
    ``data`` as pixel INDICES: each input byte becomes two 4-bit
    palette indices (hi nibble first, per spec bit order), mapped
    through a CRC-checked 16-entry grayscale-ramp PLTE (entry i =
    i·17 in every channel, spanning 0..255).  Same cycling scanline
    filters and two-IDAT split as :func:`_png_container`; rows pack
    ``width``/2 input bytes, final row zero-padded, empty input
    becomes one blank row.  A decoder only recovers the data by real
    defiltering, sub-byte unpacking AND palette expansion."""
    import struct

    row_bytes = width // 2  # 2 pixels per packed byte at depth 4
    height = max(1, -(-len(data) // row_bytes))
    plane = data + b"\x00" * (row_bytes * height - len(data))
    ihdr = struct.pack(">IIBBBBB", width, height, 4, 3, 0, 0, 0)
    plte = bytes(v for i in range(16) for v in (i * 17,) * 3)
    return _png_assemble(
        ihdr, _png_filter_plane(plane, row_bytes, height), plte
    )


# Adam7 interlace passes (spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

# spec §11.2.2: legal (color type -> bit depths)
_PNG_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _png_defilter_image(
    raw: bytes, offset: int, width: int, height: int, channels: int, depth: int
) -> tuple[np.ndarray, int]:
    """Defilter one (sub)image of ``height`` scanlines starting at
    byte ``offset`` of the inflated stream and unpack it to one value
    per SAMPLE (int64).  Filtering is byte-oriented per spec §9
    regardless of depth: bpp = max(1, channels·depth/8); scanline
    payload = ceil(width·channels·depth/8) bytes.  Returns (samples
    row-major, bytes consumed)."""
    if width == 0 or height == 0:
        return np.zeros(0, dtype=np.int64), 0
    row_bytes = (width * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    need = height * (row_bytes + 1)
    if offset + need > len(raw):
        raise ValueError("PNG pixel stream length mismatch")
    recon = bytearray(height * row_bytes)
    for r in range(height):
        ft = raw[offset + r * (row_bytes + 1)]
        line = raw[
            offset + r * (row_bytes + 1) + 1 : offset + (r + 1) * (row_bytes + 1)
        ]
        base = r * row_bytes
        for i in range(row_bytes):
            x = line[i]
            a = recon[base + i - bpp] if i >= bpp else 0
            b = recon[base + i - row_bytes] if r else 0
            c = (
                recon[base + i - row_bytes - bpp]
                if (r and i >= bpp)
                else 0
            )
            if ft == 1:
                x += a
            elif ft == 2:
                x += b
            elif ft == 3:
                x += (a + b) >> 1
            elif ft == 4:
                x += _paeth(a, b, c)
            elif ft != 0:
                raise ValueError(f"PNG filter type {ft} invalid")
            recon[base + i] = x & 0xFF
    grid = np.frombuffer(bytes(recon), dtype=np.uint8).reshape(
        height, row_bytes
    )
    n_samples = width * channels
    if depth == 8:
        samples = grid[:, :n_samples].astype(np.int64)
    elif depth == 16:
        samples = (
            grid.astype(np.int64)[:, 0 : 2 * n_samples : 2] << 8
        ) | grid.astype(np.int64)[:, 1 : 2 * n_samples : 2]
    else:  # 1/2/4-bit: MSB-first bit groups, pad bits dropped per row
        bits = np.unpackbits(grid, axis=1)
        weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.int64)
        samples = (
            bits.reshape(height, -1, depth).astype(np.int64) @ weights
        )[:, :n_samples]
    return samples.reshape(-1), need


def _decode_png(payload: bytes) -> tuple[dict, np.ndarray]:
    """REAL PNG decode via stdlib zlib — the COMPLETE static-image
    spec surface: chunk walk with per-chunk CRC32 verification, IHDR
    parse, multi-IDAT concatenation, zlib inflate, byte-oriented
    defiltering of all five filter types, every legal (color type,
    bit depth) combination — gray 1/2/4/8/16, palette 1/2/4/8 (via
    the CRC-checked PLTE table), gray+alpha and RGB(A) 8/16 — and
    Adam7 interlacing (seven defiltered sub-images recomposed onto
    the pixel grid).  Output: uint8 samples (uint16 for 16-bit
    planes), palette always expanded to 8-bit RGB.  Only codecs that
    genuinely need an absent library (JPEG/MP3) remain
    NotImplementedError."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + size > len(payload):
            # A lying length field would otherwise silently shorten
            # `body` before the CRC check (or crash struct.unpack on
            # the short CRC slice) — hostile crawl bytes hit this
            # before anything else.
            raise ValueError(f"truncated PNG chunk {tag!r}")
        body = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + size : pos + 12 + size]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if not body or len(body) % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise ValueError("non-positive PNG dimensions")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} not supported")
    if depth not in _PNG_LEGAL_DEPTHS[color]:
        raise ValueError(
            f"PNG depth {depth} illegal for color type {color}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        samples, used = _png_defilter_image(
            raw, 0, width, height, channels, depth
        )
        if used != len(raw):
            raise ValueError("PNG pixel stream length mismatch")
        sample_grid = samples.reshape(height, width * channels)
    else:  # Adam7: seven independently-filtered sub-images recompose
        sample_grid = np.zeros((height, width * channels), dtype=np.int64)
        offset = 0
        for x0, y0, xs, ys in _ADAM7_PASSES:
            pw = (width - x0 + xs - 1) // xs if x0 < width else 0
            ph = (height - y0 + ys - 1) // ys if y0 < height else 0
            sub, used = _png_defilter_image(
                raw, offset, pw, ph, channels, depth
            )
            offset += used
            if pw and ph:
                sub = sub.reshape(ph, pw, channels)
                for ch in range(channels):
                    sample_grid[
                        y0::ys, (x0 * channels + ch) :: (xs * channels)
                    ] = sub[:, :, ch]
        if offset != len(raw):
            raise ValueError("PNG pixel stream length mismatch")
    px = sample_grid.reshape(-1)
    bits = depth
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(px.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette PNG index beyond PLTE table")
        px = pal[px].reshape(-1).astype(np.uint8)
        channels, bits = 3, 8
    elif depth == 16:
        px = px.astype(np.uint16)
    else:
        px = px.astype(np.uint8)
    meta = {
        "format": "png",
        "n_channels": channels,
        "sample_rate": None,
        "bits_per_sample": bits,
        "n_samples": None,
        "width": width,
        "height": height,
    }
    return meta, px


def decode_payload(payload: bytes) -> tuple[dict, np.ndarray]:
    """Route a payload to its REAL decoder by magic bytes.

    Raises:
        NotImplementedError: for containers whose codecs are genuinely
        absent in this environment (JPEG/MP3/...); RIFF-PCM WAV,
        binary PPM, and 8-bit non-interlaced PNG decode for real.
    """
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    raise NotImplementedError(
        f"no decoder for payload magic {payload[:4]!r}: compressed codecs "
        "(PIL/ffmpeg/torchaudio) are not present in this environment"
    )


def attach_wav_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap each document's utf-8 bytes in a GENUINE RIFF/WAVE
    container (8-bit mono PCM) — the deterministic stand-in for
    reading real audio blobs from object storage, except the container
    format is real and must survive a real header parse."""
    from real_time_data_analytics_cassandra_spark.catalog import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "payload": batch["text"].map(
                        lambda t: _wav_container(t.encode("utf-8"))
                    ),
                }
            )

    src = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        run,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


PPM_WIDTH = 32


def _ppm_container(data: bytes, width: int = PPM_WIDTH) -> bytes:
    """A genuine binary PPM (P6) holding ``data`` as the RGB plane of
    a ``width``-wide image (zero-padded final row; empty input becomes
    one black row) — includes a comment line so decoders must handle
    the spec's comment syntax."""
    height = max(1, -(-len(data) // (width * 3)))
    plane = data + b"\x00" * (width * height * 3 - len(data))
    header = f"P6\n# rtdac fixture\n{width} {height}\n255\n".encode()
    return header + plane


def attach_ppm_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap each document's utf-8 bytes in a GENUINE binary PPM (P6)
    container — the uncompressed-image sibling of attach_png_payload;
    the decode side must run a real header token scan (with comment
    handling) to find the plane."""
    from real_time_data_analytics_cassandra_spark.catalog import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "payload": batch["text"].map(
                        lambda t: _ppm_container(t.encode("utf-8"))
                    ),
                }
            )

    src = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        run,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def _png_container_adam7(data: bytes, width: int = PNG_WIDTH) -> bytes:
    """A genuine ADAM7-INTERLACED PNG holding ``data`` as an 8-bit
    grayscale image (zero-padded final row): the pixel grid splits
    into the seven spec passes, each pass filtered as its own
    sub-image — a decoder only recovers the row-major plane by
    implementing the full interlace recomposition.  Filter type 0 per
    scanline (the sequential container exercises the five filters;
    this one exercises pass geometry)."""
    import struct
    import zlib

    height = max(1, -(-len(data) // width))
    plane = data + b"\x00" * (width * height - len(data))
    stream = bytearray()
    for x0, y0, xs, ys in _ADAM7_PASSES:
        for y in range(y0, height, ys):
            row = plane[y * width : (y + 1) * width][x0::xs]
            if row:
                stream += bytes([0]) + row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _png_chunk(b"IEND", b"")
    )


def attach_png_adam7_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Wrap each document's utf-8 bytes in a GENUINE Adam7-interlaced
    PNG (:func:`_png_container_adam7`) — the interlaced twin of
    :func:`attach_png_payload`."""
    from real_time_data_analytics_cassandra_spark.catalog import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "payload": batch["text"].map(
                        lambda t: _png_container_adam7(t.encode("utf-8"))
                    ),
                }
            )

    src = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        run,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def attach_png_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap each document's utf-8 bytes in a GENUINE PNG container
    (8-bit grayscale, cycling scanline filters, two IDAT chunks —
    :func:`_png_container`): the deterministic stand-in for reading
    real image blobs from object storage, except the container is a
    spec-valid PNG that only a real defiltering decoder can read."""
    from real_time_data_analytics_cassandra_spark.catalog import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "payload": batch["text"].map(
                        lambda t: _png_container(t.encode("utf-8"))
                    ),
                }
            )

    src = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        run,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def attach_png_palette_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Wrap each document's utf-8 bytes in a GENUINE 4-bit PALETTE PNG
    (:func:`_png_container_palette`) — the sub-8-bit/PLTE sibling of
    :func:`attach_png_payload`, so the palette-expansion and sub-byte
    unpacking decode paths are exercised end-to-end by a registry
    query, not only by test-side encoders."""
    from real_time_data_analytics_cassandra_spark.catalog import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "payload": batch["text"].map(
                        lambda t: _png_container_palette(t.encode("utf-8"))
                    ),
                }
            )

    src = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        run,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def attach_png_gray16_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Wrap each document's utf-8 bytes in a GENUINE 16-bit grayscale
    PNG (:func:`_png_container_gray16`) — the high-bit-depth sibling
    of :func:`attach_png_payload`, driving the decoder's two-byte
    sample unpacking and bpp=2 defiltering end-to-end."""
    from real_time_data_analytics_cassandra_spark.catalog import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "payload": batch["text"].map(
                        lambda t: _png_container_gray16(t.encode("utf-8"))
                    ),
                }
            )

    src = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        run,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def attach_png_rgba_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Wrap each document's utf-8 bytes in a GENUINE 8-bit RGBA PNG
    (:func:`_png_container_rgba`) — the multi-channel sibling of
    :func:`attach_png_payload`, driving the decoder's 4-channel
    interleaving and bpp=4 defiltering end-to-end."""
    from real_time_data_analytics_cassandra_spark.catalog import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "payload": batch["text"].map(
                        lambda t: _png_container_rgba(t.encode("utf-8"))
                    ),
                }
            )

    src = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(
        run,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def extract_features_arrow(df_with_payload: DataFrame) -> DataFrame:
    """``extract_features`` through the ``mapInArrow`` surface: pure
    pyarrow RecordBatches in and out, no pandas materialization — the
    API to reach for when the per-batch math is numpy/Arrow-native and
    the pandas conversion would only add copies.  Bit-identical to the
    pandas form (same integer counts divided as IEEE doubles; proven
    in tests and by sharing the multimodal_features oracle)."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterable["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            feats = []
            for p in payloads:
                arr = np.frombuffer(p.as_py() or b"", dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * FEATURE_DIM)
                else:
                    counts = np.bincount(arr >> 4, minlength=FEATURE_DIM)
                    feats.append((counts / arr.size).tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(
                        batch.schema.get_field_index("doc_id")
                    ).cast(pa.int64()),
                    pa.array(feats, type=pa.list_(pa.float64())),
                ],
                names=["doc_id", "features"],
            )

    return df_with_payload.mapInArrow(run, FEATURE_SCHEMA)


def decode_media_real(df_with_payload: DataFrame) -> DataFrame:
    """REAL container decode over the binary column, Arrow-batched:
    each payload's header is actually parsed (RIFF chunk walk / PPM
    token scan) and its sample plane actually read — no metadata is
    derived arithmetically from byte length.  Payloads in containers
    whose codecs are absent here raise NotImplementedError, so the
    stub boundary is now only where a codec library is genuinely
    missing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                meta, _samples = decode_payload(bytes(payload))
                rows.append(
                    {"doc_id": doc_id, "byte_len": len(payload), **meta}
                )
            out = pd.DataFrame(rows)
            for c in (
                "doc_id",
                "n_channels",
                "sample_rate",
                "bits_per_sample",
                "n_samples",
                "width",
                "height",
                "byte_len",
            ):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out[[f.name for f in REAL_DECODE_SCHEMA.fields]]

    return df_with_payload.mapInPandas(run, schema=REAL_DECODE_SCHEMA)


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


# ---------------------------------------------------------------------------
# Image perceptual hashing (average hash) — the multimodal arm of the
# dedup family: a 64-bit signature computed from the REAL decoded
# pixel plane, clustered exactly, then near-linked with the same
# banded-Hamming pigeonhole recipe as dedup.simhash_near_pairs.
# Everything is pure integer arithmetic over deterministic pixels, so
# the whole family carries FULL DuckDB oracles (the oracle recomputes
# the hash arithmetically from the document bytes the PNG container
# wraps; the Spark side earns those pixels through the genuine
# CRC-checked zlib decode).

AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sig_hi", LongType()),
        StructField("sig_lo", LongType()),
    ]
)


def image_ahash_signatures(df_with_payload: DataFrame) -> DataFrame:
    """64-bit AVERAGE HASH (aHash) per image, from the real decoded
    single-channel pixel plane — the classic perceptual signature
    (downsample to an 8x8 grid, threshold each cell against the
    global mean) in exact integer form:

    - cell of pixel (r, c) on a WxH plane: i = 8*((r*8)//H) + (c*8)//W
      (integer grid mapping; cells may be empty when H < 8);
    - bit_b = 1  iff  cell_sum_b * N > total_sum * cell_npix_b
      (cell mean > plane mean, cross-multiplied so no division);
    - signature packed MSB-first into two 32-bit halves (sig_hi =
      bits 0..31, sig_lo = bits 32..63) so every value stays a
      non-negative BIGINT in any engine.

    Arrow-batched numpy over mapInPandas — one decode + one bincount
    per image, no per-row Python in the aggregation; O(1) state per
    image.  Requires a single-channel plane (the gray-8 PNG
    container; PPM decodes to 3 interleaved channels and is
    rejected); multi-channel payloads raise ValueError rather than
    silently hashing interleaved samples.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            ids, his, los = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                meta, px = decode_payload(bytes(payload))
                if meta["n_channels"] != 1:
                    raise ValueError(
                        "image_ahash_signatures needs a single-channel "
                        f"plane, got {meta['n_channels']} channels"
                    )
                w, h = meta["width"], meta["height"]
                v = px.astype(np.int64)
                idx = np.arange(v.size, dtype=np.int64)
                cell = 8 * ((idx // w) * 8 // h) + (idx % w) * 8 // w
                cell_sum = np.zeros(64, dtype=np.int64)
                np.add.at(cell_sum, cell, v)
                cell_npix = np.bincount(cell, minlength=64).astype(np.int64)
                total = int(v.sum())
                n = int(v.size)
                bits = cell_sum * n > total * cell_npix
                hi = 0
                lo = 0
                for b in range(32):
                    hi = (hi << 1) | int(bits[b])
                    lo = (lo << 1) | int(bits[32 + b])
                ids.append(int(doc_id))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sig_hi": pd.Series(his, dtype="int64"),
                    "sig_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df_with_payload.mapInPandas(run, schema=AHASH_SCHEMA)


def image_ahash_clusters(sig: DataFrame) -> DataFrame:
    """Exact perceptual-duplicate clusters: group on the full 64-bit
    signature, canonical member = lowest doc_id — the image twin of
    dedup.exact_duplicate_groups, and the COLLAPSE step that makes
    near-linking sublinear on template-heavy corpora (the near join
    runs over distinct signatures, never over documents).  One hash
    aggregate + one equi-join back; no pair blowup possible."""
    clusters = sig.groupBy("sig_hi", "sig_lo").agg(
        F.min("doc_id").alias("canon_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )
    return sig.join(clusters, ["sig_hi", "sig_lo"]).select(
        "doc_id", "sig_hi", "sig_lo", "canon_id", "cluster_size"
    )


def signature_near_pairs(
    sig: DataFrame, n_bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate links between signature-duplicate CLUSTERS:
    banded-Hamming candidate generation over the DISTINCT 64-bit
    signatures (``n_bands`` equal bands; pigeonhole — Hamming <=
    n_bands - 1 forces at least one identical band, so candidates
    are LOSSLESS for any ``max_hamming`` < n_bands, asserted), then
    exact Hamming verification via xor + bit_count.  Output one row
    per linked cluster pair: (doc_a, doc_b) are the clusters'
    canonical doc_ids, with the exact Hamming distance and both
    cluster sizes — the dedup decision table.  Shared by every
    64-bit perceptual signature here (image aHash, audio energy
    fingerprint).

    Scale shape: the quadratic surface is |distinct signatures within
    a shared band|, never |documents| — exact collapse first means a
    corpus of near-identical template media (a realistic worst case)
    contributes each template ONCE to the band join.  All integer
    equi-joins; no UDF past the signature stage.
    """
    assert max_hamming < n_bands, (
        "pigeonhole losslessness needs max_hamming < n_bands"
    )
    clusters = sig.groupBy("sig_hi", "sig_lo").agg(
        F.min("doc_id").alias("canon_id"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    band_exprs = _band_val_exprs(n_bands)
    banded = clusters.select(
        "canon_id",
        F.posexplode(F.array(*band_exprs)).alias("band", "band_val"),
    )
    cand = (
        banded.select(F.col("canon_id").alias("doc_a"), "band", "band_val")
        .join(
            banded.select(
                F.col("canon_id").alias("doc_b"), "band", "band_val"
            ),
            ["band", "band_val"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = clusters.select(
        F.col("canon_id").alias("doc_a"),
        F.col("sig_hi").alias("hi_a"),
        F.col("sig_lo").alias("lo_a"),
        F.col("n_docs").alias("n_docs_a"),
    )
    b = clusters.select(
        F.col("canon_id").alias("doc_b"),
        F.col("sig_hi").alias("hi_b"),
        F.col("sig_lo").alias("lo_b"),
        F.col("n_docs").alias("n_docs_b"),
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "hamming",
            (
                F.bit_count(
                    F.col("hi_a").bitwiseXOR(F.col("hi_b"))
                )
                + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming", "n_docs_a", "n_docs_b")
    )


def image_ahash_near_pairs(
    sig: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Image form of :func:`signature_near_pairs`: 4 bands of 16 bits
    over the aHash signatures (lossless for Hamming <= 3)."""
    return signature_near_pairs(sig, n_bands=4, max_hamming=max_hamming)


def _band_val_exprs(n_bands: int) -> list:
    """The ``n_bands`` equal band-value expressions over (sig_hi,
    sig_lo) — shared by the batch pair operator and the incremental
    band index so both cut signatures identically."""
    assert 64 % n_bands == 0 and 32 % (64 // n_bands) == 0, (
        "bands must divide evenly and never straddle the hi/lo halves"
    )
    w = 64 // n_bands
    mask = F.lit((1 << w) - 1)
    exprs = []
    for j in range(n_bands):
        half = "sig_hi" if (j + 1) * w <= 32 else "sig_lo"
        shift = (32 if half == "sig_hi" else 64) - (j + 1) * w
        exprs.append(F.shiftrightunsigned(half, shift).bitwiseAND(mask))
    return exprs


N_BAND_BUCKETS = 16


def incremental_signature_pairs_fold(
    sig_batch: DataFrame,
    cluster_path: str,
    band_path: str,
    pair_path: str,
    batch_id: int,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> None:
    """Fold one micro-batch of 64-bit signatures into the
    STREAM-MAINTAINED near-pair state — the perceptual twin of
    index.append_text_index's O(batch) append discipline.  Three
    persisted tables:

    - ``cluster_path``: the min/add cluster table (canonical doc_id +
      cluster size per distinct signature — sinks/merge.merge_min_add,
      batch-id replay guard, sig_hi & 3 partition pruning);
    - ``band_path``: the BAND INDEX — one row per (band, band_val)
      per distinct signature, hive-partitioned by (band,
      band_val & 15) so a batch's probe reads only the buckets its
      own band values land in;
    - ``pair_path``: discovered near pairs keyed by the SIGNATURE
      pair (canonical ids and cluster sizes are resolved at READ
      time against the live cluster table, so late growth of a
      cluster or a new lower canonical doc_id never stales a stored
      pair).

    Per batch, only signatures NEVER SEEN BEFORE (anti-join against
    the cluster table, checked before this batch's merge) generate
    work: they probe their <= n_bands band buckets against the
    persisted index (new x old) and band-join among themselves
    (new x new), so every qualifying signature pair is discovered
    exactly once — when its second member first arrives — and the
    pigeonhole losslessness of the batch operator carries over
    band-for-band.  O(batch * index-slice) per micro-batch, never
    O(corpus^2).

    Replay safety: a COMPLETED batch re-arriving finds its
    signatures already in the cluster table, so new_sigs is empty
    and nothing re-appends.  The three writes land band-index ->
    pairs -> cluster merge (the merge carries the replay guard so it
    must be last); a crash after any partial prefix leaves only
    duplicate band/pair rows for the retry to re-append — the
    new-x-old probe filters identical signatures, so the retry's
    signatures meeting their own failed-attempt band rows can never
    fabricate a self-pair — and the reader heals duplicates with an
    exact distinct over the (small) pair table plus a belt-and-braces
    self-pair drop; same crash-window discipline as the index
    appends."""
    from real_time_data_analytics_cassandra_spark.sinks.merge import (
        merge_min_add,
    )

    spark = sig_batch.sparkSession
    sig_batch = sig_batch.localCheckpoint(eager=True)
    distinct_sigs = sig_batch.select("sig_hi", "sig_lo").distinct()
    jvm_fs = spark._jvm.org.apache.hadoop.fs  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001

    def _exists(p: str) -> bool:
        hp = jvm_fs.Path(p)
        return hp.getFileSystem(conf).exists(hp)

    if _exists(cluster_path):
        known = spark.read.parquet(cluster_path).select("sig_hi", "sig_lo")
        new_sigs = distinct_sigs.join(
            known, ["sig_hi", "sig_lo"], "left_anti"
        )
    else:
        new_sigs = distinct_sigs
    new_sigs = new_sigs.localCheckpoint(eager=True)

    new_bands = new_sigs.select(
        "sig_hi",
        "sig_lo",
        F.posexplode(F.array(*_band_val_exprs(n_bands))).alias(
            "band", "band_val"
        ),
    ).withColumn(
        "bucket", F.col("band_val").bitwiseAND(F.lit(N_BAND_BUCKETS - 1))
    ).localCheckpoint(eager=True)

    def _oriented(cand: DataFrame) -> DataFrame:
        x = F.struct(F.col("hi_x"), F.col("lo_x"))
        y = F.struct(F.col("hi_y"), F.col("lo_y"))
        return cand.select(
            F.when(x < y, F.col("hi_x")).otherwise(F.col("hi_y")).alias("hi_a"),
            F.when(x < y, F.col("lo_x")).otherwise(F.col("lo_y")).alias("lo_a"),
            F.when(x < y, F.col("hi_y")).otherwise(F.col("hi_x")).alias("hi_b"),
            F.when(x < y, F.col("lo_y")).otherwise(F.col("lo_x")).alias("lo_b"),
        )

    lhs = new_bands.select(
        F.col("sig_hi").alias("hi_x"),
        F.col("sig_lo").alias("lo_x"),
        "band",
        "band_val",
        "bucket",
    )
    cands = []
    if _exists(band_path):
        # partition-pruned probe: only the buckets this batch's band
        # values land in are read (<= n_bands * N_BAND_BUCKETS dirs —
        # a BOUNDED driver list, so the collect is sanctioned)
        touched = [
            (int(r["band"]), int(r["bucket"]))
            for r in new_bands.select("band", "bucket").distinct().collect()
        ]
        if touched:
            idx = spark.read.parquet(band_path)
            pred = F.lit(False)
            for band, bucket in touched:
                pred = pred | (
                    (F.col("band") == band) & (F.col("bucket") == bucket)
                )
            old = idx.filter(pred).select(
                F.col("sig_hi").alias("hi_y"),
                F.col("sig_lo").alias("lo_y"),
                "band",
                "band_val",
            )
            # signature-inequality filter (r11 ADVICE): after a crash
            # between the band append and the cluster merge, a
            # retry's new_sigs probe their OWN band rows from the
            # failed attempt — without this filter those (S, S)
            # candidates pass the hamming filter at distance 0 and
            # append self-pairs the batch operator never emits
            cands.append(
                _oriented(
                    lhs.join(old, ["band", "band_val"]).filter(
                        (F.col("hi_x") != F.col("hi_y"))
                        | (F.col("lo_x") != F.col("lo_y"))
                    )
                )
            )
    rhs = new_bands.select(
        F.col("sig_hi").alias("hi_y"),
        F.col("sig_lo").alias("lo_y"),
        "band",
        "band_val",
    )
    cands.append(
        _oriented(
            lhs.join(rhs, ["band", "band_val"]).filter(
                F.struct(F.col("hi_x"), F.col("lo_x"))
                < F.struct(F.col("hi_y"), F.col("lo_y"))
            )
        )
    )
    cand = cands[0]
    for extra in cands[1:]:
        cand = cand.unionByName(extra)
    pairs = (
        cand.distinct()
        .withColumn(
            "hamming",
            (
                F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
                + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .withColumn("p", F.col("hi_a").bitwiseAND(F.lit(3)))
    )
    # write order band-index -> pairs -> cluster merge (r11 ADVICE):
    # the cluster merge MUST land last (it carries the replay guard),
    # and putting the band append before the pair append minimizes
    # the inconsistent-state window — with the new-x-old inequality
    # filter above, a retry after ANY partial prefix of these writes
    # can only produce duplicate pair/band rows (healed by the
    # reader's distinct), never self-pairs
    new_bands.write.mode("append").partitionBy("band", "bucket").parquet(
        band_path
    )
    pairs.write.mode("append").partitionBy("p").parquet(pair_path)
    merge_min_add(
        spark,
        sig_batch.withColumn(
            "sig_part", F.col("sig_hi").bitwiseAND(F.lit(3))
        ).withColumn("one", F.lit(1).cast("long")),
        cluster_path,
        ["sig_hi", "sig_lo"],
        "doc_id",
        "one",
        "sig_part",
        batch_id=batch_id,
    )


def incremental_signature_pairs_read(
    spark, cluster_path: str, pair_path: str
) -> DataFrame:
    """Read the stream-maintained near-pair table back in the batch
    operator's shape: stored signature pairs resolve their canonical
    doc_ids and cluster sizes against the LIVE cluster table (so the
    readout always reflects every batch folded so far), oriented by
    canonical id exactly like :func:`signature_near_pairs`."""
    clu = spark.read.parquet(cluster_path).select(
        "sig_hi",
        "sig_lo",
        F.col("doc_id").cast("long").alias("canon"),
        F.col("one").cast("long").alias("n_docs"),
    )
    # schema pinned: a corpus with ZERO qualifying pairs leaves the
    # pair directory holding only partition markers, and schema
    # inference over no files would fail — the pinned read returns
    # the well-typed empty relation instead
    pairs = (
        spark.read.schema(
            "hi_a long, lo_a long, hi_b long, lo_b long, "
            "hamming long, p int"
        )
        .parquet(pair_path)
        .select("hi_a", "lo_a", "hi_b", "lo_b", "hamming")
        # belt-and-braces heal (r11 ADVICE): drop any identical-
        # signature row a pre-fix fold may have persisted — the fold
        # itself can no longer emit them
        .filter(
            (F.col("hi_a") != F.col("hi_b")) | (F.col("lo_a") != F.col("lo_b"))
        )
        .distinct()
    )
    a = clu.select(
        F.col("sig_hi").alias("hi_a"),
        F.col("sig_lo").alias("lo_a"),
        F.col("canon").alias("canon_a"),
        F.col("n_docs").alias("n_a"),
    )
    b = clu.select(
        F.col("sig_hi").alias("hi_b"),
        F.col("sig_lo").alias("lo_b"),
        F.col("canon").alias("canon_b"),
        F.col("n_docs").alias("n_b"),
    )
    joined = pairs.join(a, ["hi_a", "lo_a"]).join(b, ["hi_b", "lo_b"])
    first = F.col("canon_a") < F.col("canon_b")
    return joined.select(
        F.when(first, F.col("canon_a")).otherwise(F.col("canon_b")).alias("doc_a"),
        F.when(first, F.col("canon_b")).otherwise(F.col("canon_a")).alias("doc_b"),
        "hamming",
        F.when(first, F.col("n_a")).otherwise(F.col("n_b")).alias("n_docs_a"),
        F.when(first, F.col("n_b")).otherwise(F.col("n_a")).alias("n_docs_b"),
    )


def image_dhash_signatures(df_with_payload: DataFrame) -> DataFrame:
    """64-bit DIFFERENCE HASH (dHash) per image, from the real decoded
    single-channel pixel plane — the gradient sibling of
    :func:`image_ahash_signatures`: the plane maps onto a 9-wide x
    8-tall integer cell grid and each bit compares HORIZONTALLY
    ADJACENT cell means instead of thresholding against the global
    mean:

    - cell of pixel (r, c) on a WxH plane:
      g = 9*((r*8)//H) + (c*9)//W   (72 cells; rows may be empty
      when H < 8 — any comparison touching an empty cell (cn = 0)
      yields bit 0, because the cross-multiplied test degenerates to
      0 > 0 regardless of the populated side's mean; implementation,
      DuckDB oracle, and the pure-Python recompute all share this
      convention);
    - bit (r, c), c in 0..7:  1  iff  cs[l]*cn[g] > cs[g]*cn[l]
      with l = 9r+c, g = l+1 (left-cell mean > right-cell mean,
      cross-multiplied so everything stays in exact integers);
    - MSB-first packing into (sig_hi, sig_lo), identical conventions
      to the aHash, so :func:`image_ahash_clusters` and
      :func:`signature_near_pairs` are shared unchanged.

    Why a second signature: aHash thresholds every cell against the
    GLOBAL plane mean, so a smooth exposure change (a per-row-band
    brightness ramp — vignettes, scanner gradients) moves cells
    across that one global threshold and flips bits; dHash compares
    each cell only to its row neighbor, and a shift that is constant
    within a cell row cancels EXACTLY in the cross-multiplied
    comparison — those near-dups link under dHash and are missed by
    aHash (gated in tests/test_multimodal_real.py).

    Arrow-batched numpy over mapInPandas; O(1) state per image; same
    single-channel contract as the aHash stage."""
    left_cells = (
        9 * np.repeat(np.arange(8, dtype=np.int64), 8)
        + np.tile(np.arange(8, dtype=np.int64), 8)
    )
    right_cells = left_cells + 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            ids, his, los = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                meta, px = decode_payload(bytes(payload))
                if meta["n_channels"] != 1:
                    raise ValueError(
                        "image_dhash_signatures needs a single-channel "
                        f"plane, got {meta['n_channels']} channels"
                    )
                w, h = meta["width"], meta["height"]
                v = px.astype(np.int64)
                idx = np.arange(v.size, dtype=np.int64)
                cell = 9 * ((idx // w) * 8 // h) + (idx % w) * 9 // w
                cs = np.zeros(72, dtype=np.int64)
                np.add.at(cs, cell, v)
                cn = np.bincount(cell, minlength=72).astype(np.int64)
                bits = (
                    cs[left_cells] * cn[right_cells]
                    > cs[right_cells] * cn[left_cells]
                )
                hi = 0
                lo = 0
                for b in range(32):
                    hi = (hi << 1) | int(bits[b])
                    lo = (lo << 1) | int(bits[32 + b])
                ids.append(int(doc_id))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sig_hi": pd.Series(his, dtype="int64"),
                    "sig_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df_with_payload.mapInPandas(run, schema=AHASH_SCHEMA)


def audio_energy_fingerprints(df_with_payload: DataFrame) -> DataFrame:
    """64-bit ENERGY-ENVELOPE fingerprint per audio payload, from the
    really-decoded PCM plane (RIFF chunk walk — :func:`_decode_wav`):
    the stream is cut into 64 equal spans (span of sample i on an
    n-sample stream: (i*64)//n — the 1-D form of the aHash grid), and
    bit_w = 1 iff the span's summed |amplitude| (deviation from the
    8-bit PCM midpoint 128) exceeds the stream mean, cross-multiplied
    so everything stays in exact integers:

        bit_w = 1  iff  span_sum_w * n > total_sum * span_len_w

    — the coarse loudness contour used for audio near-dup (a
    re-encoded or padded copy keeps its envelope; unrelated audio
    does not).  MSB-first packing into (sig_hi, sig_lo), identical
    conventions to :func:`image_ahash_signatures`, so the banded
    near-pair and cluster operators are SHARED across modalities.
    Empty streams get signature (0, 0) — a documented fixed point.

    Arrow-batched numpy over mapInPandas; O(1) state per payload.
    Requires 8-bit mono PCM (the WAV container this repo builds);
    other sample layouts raise ValueError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            ids, his, los = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                meta, samples = decode_payload(bytes(payload))
                if meta["n_channels"] != 1 or meta["bits_per_sample"] != 8:
                    raise ValueError(
                        "audio_energy_fingerprints needs 8-bit mono PCM, "
                        f"got {meta['n_channels']}ch/"
                        f"{meta['bits_per_sample']}-bit"
                    )
                v = np.abs(samples.astype(np.int64) - 128)
                n = int(v.size)
                hi = lo = 0
                if n:
                    idx = np.arange(n, dtype=np.int64)
                    span = (idx * 64) // n
                    span_sum = np.zeros(64, dtype=np.int64)
                    np.add.at(span_sum, span, v)
                    span_len = np.bincount(span, minlength=64).astype(
                        np.int64
                    )
                    total = int(v.sum())
                    bits = span_sum * n > total * span_len
                    for b in range(32):
                        hi = (hi << 1) | int(bits[b])
                        lo = (lo << 1) | int(bits[32 + b])
                ids.append(int(doc_id))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sig_hi": pd.Series(his, dtype="int64"),
                    "sig_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df_with_payload.mapInPandas(run, schema=AHASH_SCHEMA)


N_SPECTRAL_FRAMES = 3
N_SPECTRAL_BANDS = 33


def spectral_signature_py(samples: "np.ndarray") -> tuple[int, int]:
    """The Haitsma-Kalker band-energy hash of one 8-bit PCM sample
    stream, as a plain numpy function (shared verbatim by the Arrow
    stage below and the test-side recompute, so the gate compares the
    Spark PLUMBING against an independent driver-side evaluation of
    the same math):

    - the DC-centered stream splits into 3 equal frames (trailing
      remainder dropped; streams shorter than 2 samples per frame
      get the (0, 0) fixed point, same convention as the envelope);
    - per frame, the rfft power spectrum folds into 33
      LOG-SPACED bands: rfft bin k (k = 0..nb-1) lands in band
      floor(33 * ln(k+1) / ln(nb+1)) — a closed-form integer mapping
      that stays well-defined at ANY stream length (degenerate short
      streams simply leave high bands empty at energy 0);
    - bit(n, m) = 1  iff
      (E(n,m) - E(n,m+1)) - (E(n-1,m) - E(n-1,m+1)) > 0
      — the classic time- AND frequency-differenced energy sign
      (Haitsma & Kalker 2002, "A Highly Robust Audio Fingerprinting
      System"), which cancels any gain that is constant within a
      frame and any per-band gain that is constant across frames:
      exactly the re-EQ'd / level-normalized copies that defeat the
      amplitude-only envelope (the audio analog of the brightness
      ramp that motivated dHash);
    - frame pair (0,1) packs MSB-first into sig_hi, pair (1,2) into
      sig_lo — the shared 32+32 signature convention, so the banded
      near-pair / cluster / incremental operators ride unchanged.

    Float determinism: numpy's rfft and log are deterministic for a
    fixed input on a fixed build, and the >-threshold collapses the
    floats to bits; the cross-engine DuckDB oracle is forfeited
    (SQL cannot reproduce libm/FFT rounding), which is why this
    query ships recompute-gated instead of oracle-backed."""
    v = samples.astype(np.float64) - 128.0
    flen = v.size // N_SPECTRAL_FRAMES
    if flen < 2:
        return 0, 0
    frames = v[: flen * N_SPECTRAL_FRAMES].reshape(N_SPECTRAL_FRAMES, flen)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    nb = spec.shape[1]
    k = np.arange(nb, dtype=np.float64)
    band = np.floor(
        N_SPECTRAL_BANDS * np.log(k + 1.0) / np.log(nb + 1.0)
    ).astype(np.int64)
    e = np.zeros((N_SPECTRAL_FRAMES, N_SPECTRAL_BANDS), dtype=np.float64)
    for f in range(N_SPECTRAL_FRAMES):
        np.add.at(e[f], band, spec[f])
    d = e[:, :-1] - e[:, 1:]  # frequency difference, 32 per frame
    bits = (d[1:] - d[:-1]) > 0  # time difference, 2 x 32
    hi = lo = 0
    for b in range(32):
        hi = (hi << 1) | int(bits[0, b])
        lo = (lo << 1) | int(bits[1, b])
    return hi, lo


def audio_spectral_fingerprints(df_with_payload: DataFrame) -> DataFrame:
    """64-bit SPECTRAL fingerprint per audio payload
    (:func:`spectral_signature_py` over the really-decoded PCM plane
    — RIFF chunk walk, same decode the envelope uses).  Arrow-batched
    numpy over mapInPandas; O(1) state per payload; signature
    conventions identical to every other 64-bit perceptual hash in
    this module, so :func:`signature_near_pairs` and the incremental
    fold are SHARED unchanged.

    Why a second audio signature: the energy envelope
    (:func:`audio_energy_fingerprints`) is amplitude-only — a fade /
    time-varying re-gain moves spans across the one global mean and
    flips its bits, while the double-differenced band-energy signs
    here cancel frame-constant gain exactly (the dHash playbook
    applied to audio; tests/test_multimodal_real.py proves a faded
    pair the envelope misses and this hash links)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for batch in batches:
            ids, his, los = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                meta, samples = decode_payload(bytes(payload))
                if meta["n_channels"] != 1 or meta["bits_per_sample"] != 8:
                    raise ValueError(
                        "audio_spectral_fingerprints needs 8-bit mono "
                        f"PCM, got {meta['n_channels']}ch/"
                        f"{meta['bits_per_sample']}-bit"
                    )
                hi, lo = spectral_signature_py(samples)
                ids.append(int(doc_id))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sig_hi": pd.Series(his, dtype="int64"),
                    "sig_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df_with_payload.mapInPandas(run, schema=AHASH_SCHEMA)
