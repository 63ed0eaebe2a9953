"""Structured Streaming ingest: continuously parse+extract pages as they
arrive (file source standing in for Kafka/Kinesis in the sandbox), with
exactly-once sinks and watermarked windowed metrics.

The batch pipeline (job.py) is the primary path per SURVEY.md §1 — each
document is independent, so resumability comes from state tables, not
streaming.  This module covers the streaming-ingest deployment shape: a
crawler drops page files; the stream picks them up, runs the SAME
``make_parse_batch`` UDF (mapInPandas is fully supported on streaming
DataFrames), and appends to a parquet/Iceberg sink whose checkpoint gives
exactly-once file-level semantics.  ``availableNow`` triggers turn the same
query into an incremental backfill job.

Scale notes: the parse stage is stateless (no shuffle in the stream), so
throughput scales with executors exactly like the batch job; the windowed
metrics stream is the only stateful operator and keys its state by
(window, lang) — bounded cardinality, watermark-expired."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from .job import RESULT_SCHEMA, make_parse_batch

PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def stream_pages(spark, input_dir: str, max_files_per_trigger: int = 8) -> DataFrame:
    """Streaming source over a drop directory of page parquet files."""
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_parse_extract(pages: DataFrame, include_dom: bool = False) -> DataFrame:
    """The batch parse UDF applied to a streaming DataFrame (stateless map)."""
    cols = [c for c in ("url", "lang", "html") if c in pages.columns]
    return pages.select(*cols).mapInPandas(
        make_parse_batch(include_dom), RESULT_SCHEMA
    )


def start_results_sink(
    results: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Exactly-once parquet sink (Iceberg writeTo in prod)."""
    w = (
        results.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_metrics(pages: DataFrame, results: DataFrame | None = None) -> DataFrame:
    """Watermarked per-hour ingest metrics by lang: late pages beyond 2h are
    dropped from state; (window, lang) keys keep state bounded."""
    return (
        pages.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("hour"), "lang", "n_pages", "n_bytes"
        )
    )


def start_metrics_sink(metrics: DataFrame, out_dir: str, checkpoint_dir: str):
    return (
        metrics.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
