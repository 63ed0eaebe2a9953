"""Distributed parse+extract pipeline (SURVEY.md §2B).

Plan shape (all relational stages are built-in DataFrame ops; the only Python
is the Arrow-batched ``mapInPandas`` parse stage):

    scan (parquet/iceberg, column-pruned)
      -> filter (lang / size caps, pushed down)
      -> resume anti-join against the compact state table (size-gated:
         broadcast when known-small, else shuffle sort-merge)
      -> salted repartition: part_id = pmod(xxhash64(url), P), oversized docs
         get their own salt lane so one giant page cannot straggle a partition
      -> mapInPandas(parse_batch): tokenize -> tree-build -> extract per doc
      -> results sink (parquet) + per-partition progress/metrics rows

Scale notes (100 TB / 10^12 docs):
* per-doc cost varies ~1000x with page size; AQE cannot see that (it is not
  join skew), hence the explicit size-salted repartition;
* Arrow batches are capped by rows AND bytes inside the UDF iterator so an
  oversized document cannot balloon worker memory;
* everything upstream of the UDF stays in whole-stage codegen; the scan reads
  only (url, html, ...) via column pruning.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from .encoding import decode_html
from .extract import analyze_tree
from .lexer import Tokeniser
from .parse import Parser

RESULT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("lang", StringType()),
        StructField("dom", StringType()),
        StructField("text", StringType()),
        StructField("n_tokens", LongType()),
        StructField("n_nodes", LongType()),
        StructField("n_errors", LongType()),
        StructField("n_bytes", LongType()),
        StructField("parse_ms", DoubleType()),
        StructField("status", StringType()),
        StructField("part_id", LongType()),
    ]
)

# one-pass production schema: the same parse also emits hyperlinks and page
# metadata (title/h1/doctype) — at 10^12 docs you parse ONCE, not once per
# downstream consumer; the standalone linkops queries exist for the
# per-operator oracle gate and reuse the identical walker.
from pyspark.sql.types import ArrayType  # noqa: E402

LINK_STRUCT = StructType(
    [
        StructField("pos", LongType()),
        StructField("href", StringType()),
        StructField("anchor", StringType()),
    ]
)

FULL_RESULT_SCHEMA = StructType(
    list(RESULT_SCHEMA.fields)
    + [
        StructField("links", ArrayType(LINK_STRUCT)),
        StructField("title", StringType()),
        StructField("h1", StringType()),
        StructField("has_doctype", LongType()),
    ]
)


def parse_document(html: str, include_dom: bool = True, include_links: bool = False):
    """Parse one document and extract its main text.

    Returns (dom, text, n_tokens, n_nodes, status[, links, title, h1,
    has_doctype] when include_links).  Token counting lives in the Parser
    itself (Parser.n_tokens, one per tokeniser write_* call) so no
    wrapper-delegate layer sits between tokeniser and parser in the hot path.
    The link/metadata walk is a second (cheap, tree-only) pass over the
    already-built DOM — the parse itself still happens exactly once.
    """
    parser = Parser()
    lexer = Tokeniser(parser)
    lexer.parse(html)
    # second end: the reference's parse() entry ends the tokeniser twice
    # (see htmlgraft.parse.parse docstring) — replicated for byte-identity
    lexer.end_input()
    # fused single walk: dom print + candidate scoring + subtree render
    dom, text, n_nodes = analyze_tree(parser.document, include_dom)
    if not include_links:
        return dom, text, parser.n_tokens, n_nodes, "ok"
    from .linkops import analyze_links

    links, title, h1, has_doctype = analyze_links(parser.document)
    rows = [
        {"pos": k, "href": href, "anchor": anchor}
        for k, (href, anchor) in enumerate(links, start=1)
    ]
    return (
        dom, text, parser.n_tokens, n_nodes, "ok",
        rows, title, h1, has_doctype,
    )


def make_parse_batch(
    include_dom: bool = True,
    max_batch_bytes: int = 1 << 26,
    include_links: bool = False,
):
    """Build the mapInPandas function.  The inner generator re-chunks incoming
    Arrow batches so a run of oversized documents cannot balloon the pandas
    frame we materialize results into."""

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The parse builds pure trees (children arrays only, no parent or
        # sibling pointers -> no reference cycles), so refcounting reclaims
        # everything and the cyclic GC only burns memory bandwidth walking
        # millions of live objects; disabling it in the worker is safe and
        # measurably faster under high core counts.
        import gc

        # Restore the worker's prior GC state afterwards: PySpark reuses
        # Python workers (spark.python.worker.reuse), so a bare disable()
        # would leak into every later UDF stage in the same app.
        was_enabled = gc.isenabled()
        gc.disable()
        try:
            yield from _parse_batches(batches)
        finally:
            if was_enabled:
                gc.enable()

    cols = [
        "url", "lang", "dom", "text", "n_tokens", "n_nodes",
        "n_errors", "n_bytes", "parse_ms", "status", "part_id",
    ]
    if include_links:
        cols += ["links", "title", "h1", "has_doctype"]

    def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            acc_bytes = 0
            urls = pdf["url"].tolist()
            langs = pdf["lang"].tolist() if "lang" in pdf else [None] * len(urls)
            parts = pdf["part_id"].tolist() if "part_id" in pdf else [0] * len(urls)
            htmls = pdf["html"].tolist()
            # optional transport-layer charset hints (WARC sources carry
            # the HTTP Content-Type charset through a 'charset' column)
            hints = (
                pdf["charset"].tolist() if "charset" in pdf
                else [None] * len(urls)
            )
            for url, lang, part_id, raw, hint in zip(
                    urls, langs, parts, htmls, hints):
                raw_bytes = bytes(raw)
                extra = ([], None, None, 0)
                t0 = time.perf_counter()
                try:
                    # WHATWG prescan (BOM -> transport -> meta charset ->
                    # windows-1252 default): real crawls are ~5-10%
                    # non-UTF-8 and a blind utf-8 decode mojibakes them
                    # silently (encoding.py)
                    html = decode_html(raw_bytes, transport=hint)
                    parsed = parse_document(html, include_dom, include_links)
                    dom, text, n_tokens, n_nodes, status = parsed[:5]
                    if include_links:
                        extra = parsed[5:]
                    n_errors = 0
                except Exception as exc:  # reference-equivalent throws
                    dom, text, n_tokens, n_nodes = "", "", 0, 0
                    n_errors = 1
                    status = f"error:{type(exc).__name__}"
                dt = (time.perf_counter() - t0) * 1000.0
                out["url"].append(url)
                out["lang"].append(lang)
                out["dom"].append(dom)
                out["text"].append(text)
                out["n_tokens"].append(n_tokens)
                out["n_nodes"].append(n_nodes)
                out["n_errors"].append(n_errors)
                out["n_bytes"].append(len(raw_bytes))
                out["parse_ms"].append(dt)
                out["status"].append(status)
                out["part_id"].append(part_id)
                if include_links:
                    out["links"].append(extra[0])
                    out["title"].append(extra[1])
                    out["h1"].append(extra[2])
                    out["has_doctype"].append(extra[3])
                acc_bytes += len(raw_bytes) + len(dom) + len(text)
                if acc_bytes >= max_batch_bytes:
                    yield pd.DataFrame(out)
                    out = {k: [] for k in out}
                    acc_bytes = 0
            if out["url"]:
                yield pd.DataFrame(out)

    return parse_batch


# size above which a document is routed to its own salt lane
OVERSIZE_BYTES = 256 * 1024


def with_partitioning(pages: DataFrame, num_parts: int, salts: int = 8) -> DataFrame:
    """Explicit shuffle control: url-hash partitioning with a salt lane for
    oversized documents.

    The shuffle key is the HIGH-cardinality (url, salt) pair, not part_id:
    hashing only num_parts distinct part_id values into num_parts bins is a
    balls-into-bins collision generator (~4x row skew at 64 bins, measured);
    hashing urls directly balances to ~±2%.  part_id stays as the lineage /
    resume bucket (stable under re-runs).  The salt spreads an oversized
    host's documents across lanes when partitioning by host instead of url.
    """
    df = pages.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("url")), F.lit(num_parts))
    ).withColumn(
        "salt",
        F.when(
            F.length(F.col("html")) > OVERSIZE_BYTES,
            F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(salts)),
        ).otherwise(F.lit(0)),
    )
    return df.repartition(num_parts, F.col("url"), F.col("salt"))


# resume done-sets up to this many urls are broadcast (~60 B/url -> a few
# hundred MB, inside executor/driver budgets); anything larger — and any
# done-set of UNKNOWN size — takes the shuffle anti-join (sort-merge), which
# scales to the 10^12-url state tables an unconditional broadcast would OOM on
BROADCAST_DONE_MAX = 4_000_000


def parse_extract(
    pages: DataFrame,
    num_parts: int | None = None,
    include_dom: bool = True,
    done_urls: DataFrame | None = None,
    done_count: int | None = None,
    broadcast_done: bool | None = None,
    pre_partitioned: bool = False,
    include_links: bool = False,
) -> DataFrame:
    """The flagship operator: pages(url, html[, lang]) -> results.

    ``pre_partitioned=True`` skips the salted url-hash repartition and maps
    the parse UDF directly over the scan partitions.  Use it when the
    source is already balanced (e.g. many same-sized parquet files of a
    crawl dump): shuffling the full html payload costs a write+read of the
    entire corpus and buys nothing.  The default keeps the explicit
    repartition for unbalanced/skewed sources.

    Resume anti-join strategy (size-gated, never unconditional broadcast):
    ``broadcast_done=None`` auto-selects — broadcast only when the done-set
    is KNOWN (``done_count``) to fit ``BROADCAST_DONE_MAX``, else a merge
    hint forces the shuffle sort-merge anti-join that survives
    terabyte-scale done-sets."""
    spark = pages.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [c for c in ("url", "lang", "html", "charset") if c in pages.columns]
    df = pages.select(*cols)
    if done_urls is not None:
        if broadcast_done is None:
            broadcast_done = (
                done_count is not None and done_count <= BROADCAST_DONE_MAX
            )
        done = done_urls.select("url")
        done = F.broadcast(done) if broadcast_done else done.hint("merge")
        df = df.join(done, "url", "left_anti")
    if not pre_partitioned:
        df = with_partitioning(df, num_parts)
    schema = FULL_RESULT_SCHEMA if include_links else RESULT_SCHEMA
    return df.mapInPandas(
        make_parse_batch(include_dom, include_links=include_links), schema
    )


def partition_metrics(results: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics rollup (plain hash aggregation)."""
    return results.groupBy("part_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_nodes").alias("n_nodes"),
        F.sum("n_errors").alias("n_errors"),
        F.sum("n_bytes").alias("n_bytes"),
        F.sum("parse_ms").alias("parse_ms"),
        F.max("parse_ms").alias("max_parse_ms"),
    )


class ParquetCatalog:
    """Sink/state seam for ``run_job``: three logical tables (results,
    progress, state_urls) as run_id-partitioned parquet under one state
    dir.  This is the sandbox implementation; ``IcebergCatalog`` is the
    production one — ``run_job`` is written against the seam and never
    touches paths or formats itself."""

    def __init__(self, spark, out_dir: str):
        import os

        self.spark = spark
        self.results_path = os.path.join(out_dir, "results")
        self.state_path = os.path.join(out_dir, "state_urls")
        self.progress_path = os.path.join(out_dir, "progress")

    def append_results(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy("run_id").parquet(self.results_path)

    def read_run_results(self, run_id: str) -> DataFrame:
        # run_id is the physical partition column -> partition-pruned scan
        return self.spark.read.parquet(self.results_path).where(
            F.col("run_id") == run_id
        )

    def read_results(self) -> DataFrame:
        return self.spark.read.parquet(self.results_path)

    def append_progress(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.progress_path)

    def append_state(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.state_path)

    def read_state(self) -> DataFrame | None:
        """The compact (url, part_id) done-set, or None before any run."""
        if _exists_nonempty(self.spark, self.state_path):
            return self.spark.read.parquet(self.state_path)
        return None


class IcebergCatalog:
    """Production sink: three Iceberg tables ``<prefix>_results`` /
    ``<prefix>_progress`` / ``<prefix>_state_urls`` under a
    ``catalog.db.prefix`` identifier, written via the DataFrameWriterV2
    (``df.writeTo(tbl).append()``).  First write of each table creates it
    (results partitioned by run_id -> per-run reads partition-prune;
    snapshot isolation gives the resume anti-join a consistent done-set).

    The Iceberg runtime jars are absent in this sandbox, so this class is
    covered by unit tests against a fake session/DataFrame
    (tests/test_spark_job.py::test_iceberg_catalog_*), mirroring the
    ``read_pages`` dispatch stub; the seam itself is exercised end-to-end
    through ParquetCatalog by the resume tests."""

    def __init__(self, spark, ident: str):
        self.spark = spark
        self.results_tbl = f"{ident}_results"
        self.state_tbl = f"{ident}_state_urls"
        self.progress_tbl = f"{ident}_progress"

    def _append(self, df: DataFrame, tbl: str, partition_col: str | None) -> None:
        if self._table_exists(tbl):
            df.writeTo(tbl).append()
        else:
            w = df.writeTo(tbl)
            if partition_col is not None:
                w = w.partitionedBy(F.col(partition_col))
            w.create()

    def _table_exists(self, tbl: str) -> bool:
        return self.spark.catalog.tableExists(tbl)

    def append_results(self, df: DataFrame) -> None:
        self._append(df, self.results_tbl, "run_id")

    def read_run_results(self, run_id: str) -> DataFrame:
        # identity-partitioned by run_id -> Iceberg prunes to this run
        return self.spark.table(self.results_tbl).where(
            F.col("run_id") == run_id
        )

    def read_results(self) -> DataFrame:
        return self.spark.table(self.results_tbl)

    def append_progress(self, df: DataFrame) -> None:
        self._append(df, self.progress_tbl, None)

    def append_state(self, df: DataFrame) -> None:
        self._append(df, self.state_tbl, None)

    def read_state(self) -> DataFrame | None:
        if self._table_exists(self.state_tbl):
            return self.spark.table(self.state_tbl)
        return None


def make_catalog(spark, out: str):
    """``iceberg:<catalog.db.prefix>`` -> IcebergCatalog (prefix stripped,
    same routing convention as ``read_pages``); anything else is a state
    directory for run_id-partitioned parquet."""
    if out.startswith("iceberg:"):
        return IcebergCatalog(spark, out[len("iceberg:"):])
    return ParquetCatalog(spark, out)


def run_job(
    spark,
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    num_parts: int | None = None,
    include_dom: bool = True,
    resume: bool = True,
    catalog=None,
):
    """Checkpointed batch run: results + progress + state sinks behind the
    catalog seam (ParquetCatalog in the sandbox, IcebergCatalog in prod),
    idempotent via url anti-join on resume.

    Scale shape of a resume (100 TB state):
    * the done-set comes from a COMPACT (url, part_id) state table, never
      from re-reading the full results (which carry dom/text payloads);
    * its count is taken on that narrow table (parquet-footer cheap) and
      gates broadcast vs shuffle anti-join in ``parse_extract``;
    * per-run metrics aggregate ONLY the current run's results partition
      (results are partitioned by run_id -> partition-pruned scan), so an
      incremental run never pays a full-history scan.

    ``run_id`` must be unique per invocation (it names the results
    partition and the metrics rows)."""
    if catalog is None:
        catalog = make_catalog(spark, out_dir)
    done = done_count = None
    if resume:
        state = catalog.read_state()
        if state is not None:
            done = state.select("url")
            done_count = done.count()
    results = parse_extract(
        pages, num_parts=num_parts, include_dom=include_dom,
        done_urls=done, done_count=done_count,
    )
    catalog.append_results(results.withColumn("run_id", F.lit(run_id)))
    # read back ONLY this run's partition: metrics + the compact resume state
    cur = catalog.read_run_results(run_id)
    metrics = partition_metrics(cur.drop("run_id")).withColumn(
        "run_id", F.lit(run_id)
    )
    catalog.append_progress(metrics)
    catalog.append_state(cur.select("url", "part_id"))
    return catalog.read_results()


def read_pages(spark, input_path: str):
    """Input dispatch: ``iceberg:<catalog.db.table>`` loads through the
    Iceberg DataSourceV2 (table NAME after the prefix — the prefix itself
    is routing, not part of the identifier); ``warc:<dir-or-glob>`` walks
    real WARC files through the binaryFile source (warcops.read_warc_pages,
    exercised end-to-end on disk files by tests/test_warcops.py); anything
    else is a parquet path.  The Iceberg runtime jars are absent in this
    sandbox, so that branch is covered by a unit test with a stub reader;
    the parquet branch is exercised end-to-end everywhere else."""
    if input_path.startswith("iceberg:"):
        return spark.read.format("iceberg").load(
            input_path[len("iceberg:"):]
        )
    if input_path.startswith("warc:"):
        from .warcops import read_warc_pages

        return read_warc_pages(spark, input_path[len("warc:"):])
    return spark.read.parquet(input_path)


def _exists_nonempty(spark, path: str) -> bool:
    import glob
    import os

    return os.path.isdir(path) and bool(glob.glob(os.path.join(path, "*.parquet")))


def main(argv=None):
    """spark-submit entry:

        python tools/make_pyfiles_zip.py  # builds htmlgraft.zip
        spark-submit --py-files htmlgraft.zip tools/submit_job.py \\
            --input <pages parquet/iceberg path> --out <state dir> \\
            [--run-id r1] [--parts 4096] [--no-dom] [--no-resume]

    Reads a pages table (url, html[, lang]), runs the salted url-hash
    partitioned parse+extract, appends results + per-partition progress to
    the state dir, resuming idempotently from prior results."""
    import argparse

    from pyspark.sql import SparkSession

    p = argparse.ArgumentParser(description="htmlgraft parse+extract job")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--run-id", default="run")
    p.add_argument("--parts", type=int, default=None)
    p.add_argument("--no-dom", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("htmlgraft-parse").getOrCreate()
    pages = read_pages(spark, args.input)
    results = run_job(
        spark, pages, args.out,
        run_id=args.run_id, num_parts=args.parts,
        include_dom=not args.no_dom, resume=not args.no_resume,
    )
    n = results.count()
    print(f"results: {n} rows at {args.out}/results")


if __name__ == "__main__":
    main()
