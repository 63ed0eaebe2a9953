"""Distributed pipeline tests at sf0.001: DuckDB-oracle value identity,
partitioning invariance, resume idempotence, and plan shape."""

import duckdb
import pytest

from htmlgraft.corpus import pages_df, pages_oracle_cte
from htmlgraft.job import parse_extract, partition_metrics, run_job


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    df = pages_df(spark, sf_dir)
    df.cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def expected_map(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_dir}/documents.parquet'"
    )
    rows = con.execute(
        pages_oracle_cte() + " select url, text from expected"
    ).fetchall()
    return dict(rows)


def test_results_match_oracle(spark, pages, expected_map):
    res = parse_extract(pages, num_parts=8)
    rows = res.select("url", "text", "n_errors", "n_nodes").collect()
    assert len(rows) == len(expected_map) == 500
    assert sum(r["n_errors"] for r in rows) == 0
    for r in rows:
        assert r["text"] == expected_map[r["url"]], r["url"]
        assert r["n_nodes"] > 10


def test_partitioning_invariance(spark, pages, expected_map):
    """Identical (url, text) results regardless of partition count."""
    a = {
        r["url"]: r["text"]
        for r in parse_extract(pages, num_parts=3).select("url", "text").collect()
    }
    b = {
        r["url"]: r["text"]
        for r in parse_extract(pages, num_parts=17).select("url", "text").collect()
    }
    assert a == b == expected_map


def test_resume_idempotent(spark, pages, tmp_path):
    out = str(tmp_path / "out")
    half = pages.filter("doc_id % 2 = 0")
    run_job(spark, half, out, run_id="r1", num_parts=4, include_dom=False)
    n_half = spark.read.parquet(out + "/results").count()
    # resume with the full corpus: only the missing half is parsed, no dupes
    run_job(spark, pages, out, run_id="r2", num_parts=4, include_dom=False)
    res = spark.read.parquet(out + "/results")
    assert res.count() == pages.count()
    assert res.select("url").distinct().count() == pages.count()
    assert n_half < pages.count()
    # progress table covers both runs
    prog = spark.read.parquet(out + "/progress")
    assert set(r["run_id"] for r in prog.select("run_id").distinct().collect()) == {
        "r1",
        "r2",
    }


def test_partition_metrics(spark, pages):
    res = parse_extract(pages, num_parts=8, include_dom=False)
    m = partition_metrics(res).collect()
    assert sum(r["n_docs"] for r in m) == 500
    assert all(r["n_tokens"] > 0 for r in m)


def test_resume_antijoin_size_gate(spark, pages):
    """The resume anti-join must never unconditionally broadcast: a known
    small done-set broadcasts, a large or UNKNOWN-size one takes the shuffle
    sort-merge anti-join (the only shape that survives a 10^12-url state
    table)."""
    done = pages.filter("doc_id % 2 = 0").select("url")
    small = parse_extract(pages, done_urls=done, done_count=10)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    for df in (
        parse_extract(pages, done_urls=done, broadcast_done=False),
        parse_extract(pages, done_urls=done),  # unknown size -> shuffle
        parse_extract(pages, done_urls=done, done_count=10**9),  # too big
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan


def test_run_job_incremental_state(spark, pages, tmp_path):
    """Resume reads the compact state table, not the full results; metrics
    rows cover only each run's own partitions; results are partitioned by
    run_id so per-run reads prune."""
    out = str(tmp_path / "out")
    half = pages.filter("doc_id % 2 = 0")
    run_job(spark, half, out, run_id="r1", num_parts=4, include_dom=False)
    state = spark.read.parquet(out + "/state_urls")
    assert state.count() == half.count()
    assert set(state.columns) == {"url", "part_id"}
    run_job(spark, pages, out, run_id="r2", num_parts=4, include_dom=False)
    state = spark.read.parquet(out + "/state_urls")
    assert state.count() == pages.count()
    # per-run metrics: r2 processed only the missing half
    prog = spark.read.parquet(out + "/progress")
    n_by_run = {
        r["run_id"]: r["n"]
        for r in prog.groupBy("run_id").sum("n_docs")
        .withColumnRenamed("sum(n_docs)", "n").collect()
    }
    assert n_by_run["r1"] == half.count()
    assert n_by_run["r2"] == pages.count() - half.count()


def test_scan_is_pruned(spark, sf_dir):
    """Column pruning must reach the parquet scan: parsing selects only
    (url, lang, html); the scan must not read the documents 'text' column
    twice nor carry unused derived columns through the exchange."""
    spark.catalog.clearCache()  # avoid plan-fragment reuse from cached fixtures
    pages = pages_df(spark, sf_dir)
    res = parse_extract(pages, num_parts=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # derived columns (ts_seconds, warc_ts, host, r) are pruned before the
    # exchange; the scan reads only the four needed document columns
    assert "ts_seconds" not in plan
    assert "n_chars" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang:string,source:string>" in plan


def test_read_pages_dispatch():
    """Input routing: iceberg:-prefixed identifiers go through the Iceberg
    DataSourceV2 with the PREFIX STRIPPED (the identifier Iceberg sees is
    catalog.db.table); everything else reads as a parquet path.  Stubbed —
    no Iceberg runtime jars exist in this sandbox."""
    from htmlgraft.job import read_pages

    calls = []

    class _Reader:
        def format(self, fmt):
            calls.append(("format", fmt))
            return self

        def load(self, ident):
            calls.append(("load", ident))
            return "iceberg-df"

        def parquet(self, path):
            calls.append(("parquet", path))
            return "parquet-df"

    class _Spark:
        read = _Reader()

    assert read_pages(_Spark(), "iceberg:warehouse.crawl.pages") == "iceberg-df"
    assert calls == [("format", "iceberg"), ("load", "warehouse.crawl.pages")]
    calls.clear()
    assert read_pages(_Spark(), "/data/pages.parquet") == "parquet-df"
    assert calls == [("parquet", "/data/pages.parquet")]


def test_iceberg_catalog_write_paths():
    """The production sink seam: first write of a table goes through
    writeTo(tbl).partitionedBy(run_id).create() (results) or
    writeTo(tbl).create() (progress/state); subsequent writes go through
    writeTo(tbl).append().  Faked — no Iceberg jars in this sandbox; the
    fake records the exact DataFrameWriterV2 call chain."""
    from htmlgraft.job import IcebergCatalog, make_catalog

    calls = []

    class _WriterV2:
        def __init__(self, tbl):
            self.tbl = tbl

        def partitionedBy(self, col):
            calls.append(("partitionedBy", self.tbl))
            return self

        def append(self):
            calls.append(("append", self.tbl))

        def create(self):
            calls.append(("create", self.tbl))

    class _DF:
        def writeTo(self, tbl):
            calls.append(("writeTo", tbl))
            return _WriterV2(tbl)

    class _SparkCatalog:
        def __init__(self):
            self.existing = set()

        def tableExists(self, tbl):
            return tbl in self.existing

    class _Spark:
        def __init__(self):
            self.catalog = _SparkCatalog()

        def table(self, tbl):
            calls.append(("table", tbl))
            return "table-df"

    spark = _Spark()
    cat = make_catalog(spark, "iceberg:warehouse.crawl.htmlgraft")
    assert isinstance(cat, IcebergCatalog)
    assert cat.results_tbl == "warehouse.crawl.htmlgraft_results"

    # cold catalog: no state table yet -> resume sees None
    assert cat.read_state() is None

    # first write: create, results partitioned by run_id
    cat.append_results(_DF())
    assert calls == [
        ("writeTo", "warehouse.crawl.htmlgraft_results"),
        ("partitionedBy", "warehouse.crawl.htmlgraft_results"),
        ("create", "warehouse.crawl.htmlgraft_results"),
    ]
    calls.clear()
    cat.append_state(_DF())
    assert calls == [
        ("writeTo", "warehouse.crawl.htmlgraft_state_urls"),
        ("create", "warehouse.crawl.htmlgraft_state_urls"),
    ]
    calls.clear()

    # tables now exist: appends must use writeTo(...).append()
    spark.catalog.existing = {
        "warehouse.crawl.htmlgraft_results",
        "warehouse.crawl.htmlgraft_state_urls",
    }
    cat.append_results(_DF())
    cat.append_state(_DF())
    assert calls == [
        ("writeTo", "warehouse.crawl.htmlgraft_results"),
        ("append", "warehouse.crawl.htmlgraft_results"),
        ("writeTo", "warehouse.crawl.htmlgraft_state_urls"),
        ("append", "warehouse.crawl.htmlgraft_state_urls"),
    ]
    calls.clear()

    # state table exists -> resume reads it through the session catalog
    assert cat.read_state() == "table-df"
    assert calls == [("table", "warehouse.crawl.htmlgraft_state_urls")]


def test_make_catalog_parquet_default(spark, tmp_path):
    """Non-iceberg outputs route to the parquet catalog rooted at out_dir."""
    from htmlgraft.job import ParquetCatalog, make_catalog

    cat = make_catalog(spark, str(tmp_path / "state"))
    assert isinstance(cat, ParquetCatalog)
    assert cat.read_state() is None


def test_one_pass_links_match_standalone_ops(spark, pages):
    """include_links=True: the production job emits links + metadata from
    the SAME parse; rows must agree exactly with the standalone linkops
    queries (which re-parse per query for the oracle gate)."""
    from pyspark.sql import functions as F

    from htmlgraft.linkops import links_df, metadata_df

    full = parse_extract(pages, num_parts=8, include_links=True)
    one_pass_links = {
        (r["url"], r["l"]["pos"], r["l"]["href"], r["l"]["anchor"])
        for r in full.select("url", F.explode("links").alias("l")).collect()
    }
    standalone = {
        (r["url"], r["pos"], r["href"], r["anchor"])
        for r in links_df(pages, num_parts=8).collect()
    }
    assert one_pass_links == standalone and len(standalone) == 500 * 8

    one_pass_meta = {
        (r["url"], r["title"], r["h1"], r["has_doctype"])
        for r in full.select("url", "title", "h1", "has_doctype").collect()
    }
    standalone_meta = {
        (r["url"], r["title"], r["h1"], r["has_doctype"])
        for r in metadata_df(pages, num_parts=8).collect()
    }
    assert one_pass_meta == standalone_meta
    # and the text/dom columns are unchanged by the extended schema
    base = dict(
        parse_extract(pages, num_parts=8).select("url", "text").collect()
    )
    for r in full.select("url", "text").collect():
        assert r["text"] == base[r["url"]]
