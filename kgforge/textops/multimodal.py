"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct;
the Spark-side plumbing (schema, partition sizing, Arrow batch shape,
UDF signatures) is real and tested. The actual media decoding is
STUBBED — the codec libraries are not in this container — behind
`decode_stub`:
  * mode="raise": NotImplementedError (the honest production posture
    until a codec UDF is registered), or
  * mode="fake":  a deterministic fake decode (dimensions derived from
    the payload hash) so downstream plumbing can be exercised.

Design notes for 100 TB of media:
* payloads never enter a shuffle — metadata is extracted in the scan
  stage and the binary column is pruned immediately after;
* batch shape matters: Arrow batches of large binaries must be bounded
  by bytes, not rows (`maxRecordsPerBatch` + input file splits);
* feature extraction (resize/frame-sample) is mapInPandas over the
  binary column, one batch in, one metadata/feature batch out.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("magic_hex", T.StringType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test helper: fabricate a binary payload column from text (the
    driver tables carry no real media; shape is what matters)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def payload_metadata(df: DataFrame, payload_col: str = "payload", id_col: str = "id") -> DataFrame:
    """Binary metadata extraction — pure JVM, no decode: byte length,
    content hash, leading magic bytes."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(p).cast("bigint").alias("n_bytes"),
        F.md5(p).alias("content_md5"),
        F.upper(F.hex(F.substring(p, 1, 4))).alias("magic_hex"),
    )


def _u8(p, off: int):
    """Unsigned byte at 1-based offset of a binary column (JVM)."""
    return F.conv(F.hex(F.substring(p, off, 1)), 16, 10).cast("long")


def parse_image_header(
    df: DataFrame, payload_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """REAL header parsing for the formats readable without a codec —
    pure byte arithmetic, entirely JVM expressions (no Python, no
    decode): (id, format, width, height).

    * PNG  (\\x89PNG\\r\\n\\x1a\\n): IHDR width/height, big-endian
      uint32 at offsets 16/20
    * GIF  (GIF87a/GIF89a): logical-screen width/height, little-endian
      uint16 at offsets 6/8
    * BMP  (BM): BITMAPINFOHEADER width/height, little-endian int32 at
      offsets 18/22 (height may be negative = top-down; abs() taken)
    * JPEG (\\xff\\xd8\\xff): detected by magic only — dimensions live
      in a variable-position SOF segment, which needs a scan, i.e. the
      decode_stub path

    True codec formats stay behind decode_stub (module docstring)."""
    p = F.col(payload_col)
    hex8 = F.upper(F.hex(F.substring(p, 1, 8)))

    is_png = hex8 == "89504E470D0A1A0A"
    is_gif = F.substring(p, 1, 4).cast("string") == "GIF8"
    is_bmp = F.upper(F.hex(F.substring(p, 1, 2))) == "424D"
    is_jpeg = F.upper(F.hex(F.substring(p, 1, 3))) == "FFD8FF"

    png_w = ((_u8(p, 17) * 256 + _u8(p, 18)) * 256 + _u8(p, 19)) * 256 + _u8(p, 20)
    png_h = ((_u8(p, 21) * 256 + _u8(p, 22)) * 256 + _u8(p, 23)) * 256 + _u8(p, 24)
    gif_w = _u8(p, 7) + _u8(p, 8) * 256
    gif_h = _u8(p, 9) + _u8(p, 10) * 256
    bmp_w = (
        _u8(p, 19) + _u8(p, 20) * 256 + _u8(p, 21) * 65536 + _u8(p, 22) * 16777216
    )
    bmp_h = (
        _u8(p, 23) + _u8(p, 24) * 256 + _u8(p, 25) * 65536 + _u8(p, 26) * 16777216
    )
    # BMP height is SIGNED little-endian (negative = top-down rows)
    bmp_h_signed = F.when(bmp_h >= F.lit(1 << 31), bmp_h - F.lit(1 << 32)).otherwise(
        bmp_h
    )

    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_jpeg, F.lit("jpeg"))
        .otherwise(F.lit(None).cast("string"))
    )
    width = (
        F.when(is_png, png_w).when(is_gif, gif_w).when(is_bmp, bmp_w).cast("int")
    )
    height = (
        F.when(is_png, png_h)
        .when(is_gif, gif_h)
        .when(is_bmp, F.abs(bmp_h_signed))
        .cast("int")
    )
    return df.select(
        F.col(id_col).alias("id"),
        fmt.alias("format"),
        width.alias("width"),
        height.alias("height"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    mode: str = "raise",
    feature_dim: int = 8,
) -> DataFrame:
    """Decode / feature-extract stage (STUB — see module docstring).

    mode="fake" produces deterministic pseudo-metadata + a unit-norm
    feature vector derived from the payload md5, so partitioning, batch
    shape, and downstream joins are exercised end to end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "raise":
                raise NotImplementedError(
                    "media decode requires a codec library not present in "
                    "this container; register a real decode UDF or use "
                    "mode='fake' for plumbing tests"
                )
            ids, ws, hs, fr, feats = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(bytes(payload)).digest()
                ids.append(int(i))
                ws.append(64 + digest[0])
                hs.append(64 + digest[1])
                fr.append(1 + digest[2] % 16)
                raw = [b / 255.0 for b in digest[: feature_dim]]
                norm = sum(x * x for x in raw) ** 0.5 or 1.0
                feats.append([float(x / norm) for x in raw])
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "n_frames": fr, "feature": feats}
            )

    return df.select(F.col(id_col).alias("id"), F.col(payload_col)).mapInPandas(
        run, schema=_DECODE_SCHEMA
    )


def parse_audio_header(
    df: DataFrame, payload_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """REAL audio header parsing without a codec — pure JVM byte
    arithmetic, same posture as parse_image_header:
    (id, format, channels, sample_rate, bits_per_sample, duration_ms).

    * WAV  (RIFF....WAVE): canonical 44-byte layout ("fmt " chunk at
      13, "data" chunk at 37) fully parsed — channels/sample-rate/
      byte-rate/bits little-endian at 23/25/29/35, data size at 41;
      duration_ms = data_size * 1000 / byte_rate. Non-canonical chunk
      orders are detected as wav with NULL fields (a chunk WALK needs
      the decode path).
    * FLAC (fLaC): STREAMINFO bitfields — 20-bit sample rate, 3-bit
      channels-1, 5-bit bps-1, 36-bit total samples (duration).
    * OGG (OggS) / MP3 (ID3 tag or frame sync): magic detect only —
      their rates live in codec-specific frames.
    """
    p = F.col(payload_col)

    def _ascii(off: int, n: int) -> F.Column:
        return F.substring(p, off, n).cast("string")

    is_wav = (_ascii(1, 4) == "RIFF") & (_ascii(9, 4) == "WAVE")
    canonical = is_wav & (_ascii(13, 4) == "fmt ") & (_ascii(37, 4) == "data")
    wav_ch = _u8(p, 23) + _u8(p, 24) * 256
    wav_sr = (
        _u8(p, 25) + _u8(p, 26) * 256 + _u8(p, 27) * 65536 + _u8(p, 28) * 16777216
    )
    wav_byte_rate = (
        _u8(p, 29) + _u8(p, 30) * 256 + _u8(p, 31) * 65536 + _u8(p, 32) * 16777216
    )
    wav_bits = _u8(p, 35) + _u8(p, 36) * 256
    wav_dsize = (
        _u8(p, 41) + _u8(p, 42) * 256 + _u8(p, 43) * 65536 + _u8(p, 44) * 16777216
    )
    wav_dur = F.floor(wav_dsize * 1000 / wav_byte_rate)

    is_flac = _ascii(1, 4) == "fLaC"
    flac_sr = _u8(p, 19) * 4096 + _u8(p, 20) * 16 + F.floor(_u8(p, 21) / 16)
    flac_ch = F.floor((_u8(p, 21) % 16) / 2) + 1
    flac_bits = (_u8(p, 21) % 2) * 16 + F.floor(_u8(p, 22) / 16) + 1
    flac_samples = (
        (_u8(p, 22) % 16) * F.lit(4294967296)
        + _u8(p, 23) * 16777216
        + _u8(p, 24) * 65536
        + _u8(p, 25) * 256
        + _u8(p, 26)
    )
    flac_dur = F.floor(flac_samples * 1000 / flac_sr)

    is_ogg = _ascii(1, 4) == "OggS"
    is_mp3 = (_ascii(1, 3) == "ID3") | F.upper(F.hex(F.substring(p, 1, 2))).isin(
        "FFFB", "FFF3", "FFF2"
    )

    fmt = (
        F.when(is_wav, F.lit("wav"))
        .when(is_flac, F.lit("flac"))
        .when(is_ogg, F.lit("ogg"))
        .when(is_mp3, F.lit("mp3"))
        .otherwise(F.lit(None).cast("string"))
    )
    channels = F.when(canonical, wav_ch).when(is_flac, flac_ch).cast("int")
    sample_rate = F.when(canonical, wav_sr).when(is_flac, flac_sr).cast("int")
    bits = F.when(canonical, wav_bits).when(is_flac, flac_bits).cast("int")
    duration_ms = (
        F.when(canonical & (wav_byte_rate > 0), wav_dur)
        .when(is_flac & (flac_sr > 0), flac_dur)
        .cast("bigint")
    )
    return df.select(
        F.col(id_col).alias("id"),
        fmt.alias("format"),
        channels.alias("channels"),
        sample_rate.alias("sample_rate"),
        bits.alias("bits_per_sample"),
        duration_ms.alias("duration_ms"),
    )


def parse_video_header(
    df: DataFrame, payload_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """Video container detection — pure JVM bytes, no decode:
    (id, format, major_brand).

    * MP4/MOV family: size(4) + "ftyp" at offset 5, major brand ASCII
      at 9-12 (isom/mp42/qt  /M4V ...)
    * WebM/MKV: EBML magic 1A45DFA3 (discriminating the two needs the
      DocType element scan -> decode path; reported as "ebml")
    * AVI: RIFF....AVI(space)

    Frame dimensions live in variable-position boxes (moov/trak,
    Segment/Tracks) — that walk is the decode_stub path, same split
    as JPEG dimensions in parse_image_header."""
    p = F.col(payload_col)

    def _ascii(off: int, n: int) -> F.Column:
        return F.substring(p, off, n).cast("string")

    is_mp4 = _ascii(5, 4) == "ftyp"
    is_ebml = F.upper(F.hex(F.substring(p, 1, 4))) == "1A45DFA3"
    is_avi = (_ascii(1, 4) == "RIFF") & (_ascii(9, 4) == "AVI ")

    fmt = (
        F.when(is_mp4, F.lit("mp4"))
        .when(is_ebml, F.lit("ebml"))
        .when(is_avi, F.lit("avi"))
        .otherwise(F.lit(None).cast("string"))
    )
    brand = F.when(is_mp4, F.trim(_ascii(9, 4))).cast("string")
    return df.select(
        F.col(id_col).alias("id"),
        fmt.alias("format"),
        brand.alias("major_brand"),
    )
