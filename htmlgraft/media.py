"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is a STUB —
``_decode_stub`` derives deterministic fake features from the raw bytes (and
raises ``NotImplementedError`` if a real codec is requested).  Everything
around the stub is real and tested: the binary column synthesis, the Arrow
batch transfer, the output schema, and the per-batch re-chunking (oversized
blobs cannot balloon a batch, mirroring job.py).

Because the fake decode is a pure function of the bytes, the whole pipeline
remains value-checkable by the DuckDB oracle (``media_features_oracle_sql``
mirrors it in SQL over the source text) — a rare luxury for a UDF stage, and
exactly the pattern to keep when swapping in a real codec: pin the UDF with
a deterministic reference implementation first.

Scale notes: the stage is a pure map (no shuffle); binary columns ride Arrow
buffers zero-copy into pandas; batches are capped by bytes so a 4 GB video
blob occupies its own batch.
"""

from __future__ import annotations

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


def media_df(spark, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: the UTF-8
    bytes of the text stand in for an encoded blob; media_type cycles by
    doc_id.  No RNG, no external data."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id"),
        F.expr(
            "case cast(doc_id % 3 as int) when 0 then 'image' "
            "when 1 then 'audio' else 'video' end"
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
    )


def _decode_stub(media_type: str, blob: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic fake (width, height, frames) from the
    byte length.  A real implementation would dispatch to PIL/ffmpeg here."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    n = len(blob)
    width = 64 + n % 921
    height = 64 + (n * 7) % 513
    frames = 1 + n % 240 if media_type == "video" else 1
    return width, height, frames


def extract_features(media: DataFrame, max_batch_bytes: int = 1 << 26) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    import hashlib

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "n_bytes", "width", "height",
                "frames", "fingerprint",
            )}
            acc = 0
            for doc_id, mtype, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                raw = bytes(blob)
                w, h, fr = _decode_stub(mtype, raw)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["frames"].append(fr)
                out["fingerprint"].append(hashlib.md5(raw).hexdigest())
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
    """DuckDB mirror of media_df + extract_features (the stub decode is a
    pure function of the UTF-8 byte length, so it inlines to SQL)."""
    return f"""
      with m as (
        select doc_id,
               case doc_id % 3 when 0 then 'image'
                    when 1 then 'audio' else 'video' end as media_type,
               octet_length(encode(text)) as n,
               md5(text) as fp
        from {docs}
      )
      select doc_id, media_type,
             cast(n as bigint) as n_bytes,
             cast(64 + n % 921 as bigint) as width,
             cast(64 + (n * 7) % 513 as bigint) as height,
             cast(case when media_type = 'video' then 1 + n % 240 else 1 end
                  as bigint) as frames,
             fp as fingerprint
      from m
      order by doc_id
    """
