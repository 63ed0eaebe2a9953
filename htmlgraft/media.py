"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The DECODE step is REAL header parsing from public format specs — no
libraries needed: PNG IHDR (width/height as u32 big-endian at offset 16 of
the signature+IHDR layout), GIF87a/89a logical-screen descriptor (u16
little-endian at offset 6), JPEG SOFn segment walk (marker scan from SOI,
skipping variable-length segments until a start-of-frame carries the
dimensions), and WAV RIFF chunk walk (fmt chunk for channels/sample-rate,
data chunk for frame count).  These parsers work on real files; only the
full-pixel/full-sample decode (which would need codec libraries absent in
this container) remains out of scope — 'video' blobs keep an honest,
clearly-marked deterministic stub, and genuinely unknown formats raise
``NotImplementedError``.

The source table synthesizes blobs with REAL format headers entirely in
Spark SQL expressions (binary concat + unhex arithmetic, zero Python), with
dimensions derived deterministically from doc_id; the DuckDB oracle
recomputes the same dimensions relationally, so a header mis-parse (wrong
offset, wrong endianness) shows up as a value mismatch — the UDF is pinned
by an independent reference computation.

Per the fingerprint-placement rule for UDF stages: the content fingerprint
(md5 of the payload) and the blob length are computed JVM-side (``F.md5`` /
``F.length``) BEFORE the UDF and passed through, so only header parsing
runs in Python.

Scale notes: the stage is a pure map (no shuffle); binary columns ride Arrow
buffers zero-copy into pandas; batches are capped by bytes so a 4 GB video
blob occupies its own batch.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("media", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("frames", LongType()),
    StructField("fingerprint", StringType()),
])


# --- SQL-side blob synthesis -------------------------------------------------

def _be(expr: str, nbytes: int) -> str:
    """Spark SQL: integer expression -> big-endian binary of nbytes."""
    return f"unhex(lpad(hex({expr}), {2 * nbytes}, '0'))"


def _le(expr: str, nbytes: int) -> str:
    """Spark SQL: integer expression -> little-endian binary of nbytes."""
    h = f"lpad(hex({expr}), {2 * nbytes}, '0')"
    parts = ", ".join(
        f"substr({h}, {2 * i + 1}, 2)" for i in reversed(range(nbytes))
    )
    return f"unhex(concat({parts}))"


# deterministic synthetic dimensions (mirrored in the oracle SQL)
_W = "(16 + (doc_id * 7) % 2033)"
_H = "(16 + (doc_id * 13) % 1021)"
_CHANNELS = "(1 + doc_id % 2)"
_RATE = "(8000 + (doc_id % 5) * 4000)"

_PNG_HEADER = (
    "concat(X'89504E470D0A1A0A', X'0000000D', X'49484452', "
    f"{_be(_W, 4)}, {_be(_H, 4)}, X'0806000000', X'00000000')"
)
_GIF_HEADER = (
    f"concat(X'474946383961', {_le(_W, 2)}, {_le(_H, 2)}, X'F70000')"
)
_JPEG_HEADER = (
    "concat(X'FFD8', X'FFC0', X'0011', X'08', "
    f"{_be(_H, 2)}, {_be(_W, 2)}, X'03', X'011100021101031101')"
)
_WAV_HEADER = (
    "concat(X'52494646', "  # 'RIFF'
    f"{_le('36 + octet_length(payload)', 4)}, "
    "X'57415645', X'666D7420', X'10000000', X'0100', "  # WAVE, fmt , 16, PCM
    f"{_le(_CHANNELS, 2)}, {_le(_RATE, 4)}, "
    f"{_le(f'{_RATE} * {_CHANNELS} * 2', 4)}, "  # byte rate
    f"{_le(f'{_CHANNELS} * 2', 2)}, X'1000', "  # block align, 16 bits
    "X'64617461', "  # 'data'
    f"{_le('octet_length(payload)', 4)})"
)


def media_df(spark, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: the UTF-8
    bytes of the text stand in for the encoded payload, prefixed with a REAL
    format header (PNG/GIF/JPEG/WAV) built by pure SQL binary expressions;
    media_type cycles by doc_id (doc_id%3: image/audio/video; images
    sub-cycle doc_id%9: png/gif/jpeg).  No RNG, no external data, no Python.

    Also carries ``n_bytes`` and ``fingerprint`` (md5 of the payload)
    computed JVM-side so the downstream UDF only parses headers."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("__media_docs")
    return spark.sql(f"""
        select doc_id,
               case cast(doc_id % 3 as int) when 0 then 'image'
                    when 1 then 'audio' else 'video' end as media_type,
               case cast(doc_id % 9 as int)
                    when 0 then concat({_PNG_HEADER}, payload)
                    when 3 then concat({_GIF_HEADER}, payload)
                    when 6 then concat({_JPEG_HEADER}, payload)
                    else case cast(doc_id % 3 as int)
                         when 1 then concat({_WAV_HEADER}, payload)
                         else payload end end as media,
               md5(payload) as fingerprint
        from (select doc_id, encode(text, 'UTF-8') as payload
              from __media_docs)
    """)


# --- real header parsers (public format specs) ------------------------------

def parse_png(blob: bytes):
    """PNG: 8-byte signature, then the IHDR chunk must come first; width and
    height are u32 big-endian at bytes 16..24."""
    if len(blob) < 24 or blob[:8] != b"\x89PNG\r\n\x1a\n" or blob[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", blob[16:24])
    return w, h, 1


def parse_gif(blob: bytes):
    """GIF: 'GIF87a'/'GIF89a', logical screen w/h as u16 LE at bytes 6..10."""
    if len(blob) < 10 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", blob[6:10])
    return w, h, 1


def parse_jpeg(blob: bytes):
    """JPEG: walk marker segments from SOI until a SOFn (C0-CF minus
    C4/C8/CC) carries height/width as u16 BE after the precision byte."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            return None
        marker = blob[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", blob[i + 5:i + 9])
            return w, h, 1
        seglen = struct.unpack(">H", blob[i + 2:i + 4])[0]
        i += 2 + seglen
    return None


def parse_wav(blob: bytes):
    """WAV: RIFF/WAVE container; chunk-walk to 'fmt ' (channels u16 LE,
    sample rate u32 LE) and 'data' (size -> frame count via block align).
    Returns (sample_rate, channels, n_frames)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    i, n = 12, len(blob)
    channels = rate = block_align = None
    frames = 0
    while i + 8 <= n:
        cid = blob[i:i + 4]
        size = struct.unpack("<I", blob[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            channels, rate = struct.unpack("<HI", blob[i + 10:i + 16])
            block_align = struct.unpack("<H", blob[i + 20:i + 22])[0]
        elif cid == b"data":
            avail = min(size, n - (i + 8))
            frames = avail // block_align if block_align else 0
        i += 8 + size + (size & 1)
    if rate is None:
        return None
    return rate, channels, frames


def decode_header(media_type: str, blob: bytes):
    """Dispatch: returns (width, height, frames) for images, (sample_rate,
    channels, n_frames) for audio.  'video' keeps an honest deterministic
    STUB (no container-parsing libs in this sandbox); unknown media types or
    unparseable blobs raise ``NotImplementedError``."""
    if media_type == "image":
        for p in (parse_png, parse_gif, parse_jpeg):
            got = p(blob)
            if got is not None:
                return got
        raise NotImplementedError("unrecognized image container")
    if media_type == "audio":
        got = parse_wav(blob)
        if got is None:
            raise NotImplementedError("unrecognized audio container")
        return got
    if media_type == "video":
        # STUB: deterministic fake features from the byte length; a real
        # implementation would dispatch to ffmpeg/pyav here.
        n = len(blob)
        return 64 + n % 921, 64 + (n * 7) % 513, 1 + n % 240
    raise NotImplementedError(f"no codec for media_type={media_type!r}")


def extract_features(media: DataFrame, max_batch_bytes: int = 1 << 26) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  Only header
    parsing runs in Python; n_bytes and the payload fingerprint arrive
    precomputed from the JVM when present (media_df provides them)."""
    has_fp = "fingerprint" in media.columns
    if has_fp:
        media = media.withColumn("n_bytes", F.length("media").cast("long"))
    else:  # bare (doc_id, media_type, media) input: compute both JVM-side
        media = media.withColumn("n_bytes", F.length("media").cast("long")) \
                     .withColumn("fingerprint", F.md5("media"))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "n_bytes", "width", "height",
                "frames", "fingerprint",
            )}
            acc = 0
            for doc_id, mtype, blob, nb, fp in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"],
                pdf["n_bytes"], pdf["fingerprint"],
            ):
                raw = bytes(blob)
                w, h, fr = decode_header(mtype, raw)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mtype)
                out["n_bytes"].append(int(nb))
                out["width"].append(w)
                out["height"].append(h)
                out["frames"].append(fr)
                out["fingerprint"].append(fp)
                acc += len(raw)
                if acc >= max_batch_bytes:
                    yield pd.DataFrame(out)
                    out = {k: [] for k in out}
                    acc = 0
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(feats, FEATURE_SCHEMA)


def media_features(spark, sf_dir: str) -> DataFrame:
    return extract_features(media_df(spark, sf_dir))


def media_features_oracle_sql(docs: str = "documents") -> str:
    """DuckDB mirror of media_df + extract_features: the synthetic headers
    carry dimensions that are pure functions of doc_id, so the oracle
    recomputes them relationally — an independent pin on the Python header
    parsers (offset or endianness bugs mismatch here)."""
    return f"""
      with m as (
        select doc_id,
               case doc_id % 3 when 0 then 'image'
                    when 1 then 'audio' else 'video' end as media_type,
               octet_length(encode(text)) as n,
               md5(text) as fp,
               (16 + (doc_id * 7) % 2033) as w,
               (16 + (doc_id * 13) % 1021) as h,
               (1 + doc_id % 2) as ch,
               (8000 + (doc_id % 5) * 4000) as rate
        from {docs}
      )
      select doc_id, media_type,
             cast(n + case doc_id % 9
                      when 0 then 33 when 3 then 13 when 6 then 21
                      else case doc_id % 3 when 1 then 44 else 0 end end
                  as bigint) as n_bytes,
             cast(case doc_id % 3 when 0 then w
                  when 1 then rate
                  else 64 + n % 921 end as bigint) as width,
             cast(case doc_id % 3 when 0 then h
                  when 1 then ch
                  else 64 + (n * 7) % 513 end as bigint) as height,
             cast(case doc_id % 3 when 0 then 1
                  when 1 then n // (2 * ch)
                  else 1 + n % 240 end as bigint) as frames,
             fp as fingerprint
      from m
      order by doc_id
    """
