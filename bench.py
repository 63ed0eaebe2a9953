#!/usr/bin/env python
"""Benchmark runner: headline parse+extract throughput plus representative
operator timings at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "docs": N, "docs_per_sec": ..., "mb_per_sec": ..., "cpus": N}

Scaling evidence (BASELINE.json north rule: >=0.8 efficiency N -> 4N):
  SPARK_GRAFT_CPUS=8 python bench.py   # N
  SPARK_GRAFT_CPUS=32 python bench.py  # 4N
then efficiency = t8 / (4 * t32) on the headline (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# executors' python workers import htmlgraft too (the UDF closure)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # corpus multiplier: unions deterministic shifted copies so the parse
    # stage carries enough work to amortize fixed stage overheads (the
    # scaling-efficiency measurement needs parse-bound, not overhead-bound,
    # wall times)
    mult = int(os.environ.get("SPARK_GRAFT_MULT", "30"))
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("htmlgraft-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # small split size: parse cost is ~30x the scan cost per byte, so
        # splits must outnumber cores even for a modest corpus (default
        # 128MB packing would give ~6 tasks for a 733MB input)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # tmpfs shuffle dir: the sandbox disk is throttled (iowait spikes
        # with load >20 while CPUs idle); shuffle blocks must not touch it
        .config("spark.local.dir", "/dev/shm/spark-graft-tmp")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from htmlgraft import eventops, simops, textops
    from htmlgraft.corpus import pages_df
    from htmlgraft.job import parse_extract

    # Stage the synthesized corpus to tmpfs parquet ONCE (outside timing):
    # the headline measures the ENGINE (scan -> parse -> extract), not the
    # SQL input synthesis, and a real crawl input would already be at rest.
    pages_path = f"/dev/shm/spark-graft-pages-{sf}-x{mult}.parquet"
    if not os.path.isdir(pages_path):
        pages_df(spark, sf_dir, multiplier=mult, num_parts=64).select(
            "url", "lang", "html"
        ).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    stats = pages.agg(
        F.count("*").alias("n"), F.sum(F.length("html")).alias("b")
    ).collect()[0]
    n_docs, n_bytes = stats["n"], stats["b"]

    timings: dict[str, float] = {}

    def timed(name, thunk):
        t0 = time.perf_counter()
        thunk()
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline: full tokenize -> tree-build -> extract (dom + text emitted),
    # forced via aggregation so no result strings leave the executors.
    # AQE off for this stage: its bytes-based partition coalescing cannot
    # see per-row Python parse cost and would serialize the UDF stage.
    # The synthetic source is balanced (round-robin repartition of the doc
    # rows BEFORE html synthesis), so the parse maps scan-direct
    # (pre_partitioned=True); the salted-shuffle variant is timed separately.
    def run_parse(pre_partitioned):
        res = parse_extract(
            spark.read.parquet(pages_path),
            num_parts=4 * cpus,
            include_dom=True,
            pre_partitioned=pre_partitioned,
        )
        res.agg(
            F.sum("n_nodes"), F.sum("n_tokens"),
            F.sum(F.length("text")), F.sum(F.length("dom")),
        ).collect()

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # warm to steady state outside the timing: python workers (imports,
    # Arrow), JVM JIT for the scan/codegen path, and the parse UDF itself —
    # a 64-doc warmup leaves the first timed run ~1.5-2x slower than hot
    parse_extract(
        pages_df(spark, sf_dir, num_parts=2 * cpus),
        num_parts=2 * cpus, include_dom=True,
    ).agg(F.sum("n_nodes")).collect()
    all_runs = []
    for i in range(runs):
        timed("parse_extract", lambda: run_parse(True))
        all_runs.append(timings["parse_extract"])
    timings["parse_extract"] = min(all_runs)
    timed("parse_extract_shuffled", lambda: run_parse(False))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    if os.environ.get("SPARK_GRAFT_HEADLINE_ONLY"):
        headline = timings["parse_extract"]
        out = {
            "metric": "parse_extract wall time",
            "value": headline, "unit": "sec", "queries": timings,
            "sf": float(sf), "docs": int(n_docs), "cpus": cpus,
            "docs_per_sec": round(n_docs / headline, 1),
            "parse_runs": all_runs, "mult": mult,
        }
        spark.stop()
        sys.stdout.write(json.dumps(out) + "\n")
        return

    timed(
        "dedup_minhash_lsh",
        lambda: textops.run_minhash_lsh(spark, sf_dir).count(),
    )
    timed(
        "dedup_simhash",
        lambda: textops.run(spark, sf_dir, textops.simhash_sql).count(),
    )
    timed(
        "ann_brute_topk",
        lambda: simops.run(spark, sf_dir, simops.ann_topk_sql).count(),
    )
    timed(
        "token_quality",
        lambda: textops.run(spark, sf_dir, textops.quality_sql).count(),
    )
    timed(
        "events_hourly",
        lambda: eventops.run(spark, sf_dir, eventops.events_hourly_sql).count(),
    )

    headline = timings["parse_extract"]
    out = {
        "metric": "parse_extract wall time (tokenize+tree-build+extract, dom+text)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "docs": int(n_docs),
        "corpus_mb": round(n_bytes / 1e6, 1),
        "docs_per_sec": round(n_docs / headline, 1),
        "mb_per_sec": round(n_bytes / 1e6 / headline, 1),
        "cpus": cpus,
        "parse_runs": all_runs,
        "mult": mult,
    }
    spark.stop()
    sys.stdout.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
