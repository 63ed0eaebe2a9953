#!/usr/bin/env python
"""Benchmark runner: headline parse+extract throughput plus representative
operator timings at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "docs": N, "docs_per_sec": ..., "mb_per_sec": ..., "cpus": N}

Scaling evidence (BASELINE.json north rule: >=0.8 efficiency N -> 4N) is ON
by default (disable with SPARK_GRAFT_SCALING=0): the identical job runs at
BOTH candidate pairs on the same staged input, emitting "scaling_4_16" and
"scaling_8_32" blocks (each with raw run lists, per-session noise probes,
and raw + probe-calibrated efficiency) plus "scaling" = the 4->16 block as
the primary.  Why 4->16 is primary on this 32-core box: the 32-core run
co-schedules the Spark driver JVM (scheduler, GC, Arrow IPC threads) with 32
pinned-busy Python workers, oversubscribing the machine, and the box itself
slows per-core beyond ~16 active cores (measured with a zero-shared-state
multiprocessing control: spin-loop efficiency 0.91 at 4->16 vs 0.73 at
8->32).  On a real cluster N->4N multiplies NODES, keeping per-core
conditions identical — which the unsaturated 4->16 pair reproduces and the
saturated 8->32 pair cannot.  Context in BENCH/BASELINE.md.
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


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("htmlgraft-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # one ~11MB staged file per task: parse cost is ~30x scan cost per
        # byte, so tasks must be file-grained, and the open-cost setting
        # must STOP Spark bin-packing several compressed files into one
        # task (64 files would otherwise pack into ~22 tasks and idle a
        # third of a 32-core box)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4m")
        # tmpfs shuffle dir: the sandbox disk is throttled (iowait spikes
        # with load >20 while CPUs idle); shuffle blocks must not touch it
        .config("spark.local.dir", "/dev/shm/spark-graft-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _ops_session(cpus: int):
    """Session for the OPERATOR timings, tuned for relational work rather
    than the headline parse: shuffle.partitions = cpus (the dedup/ANN aggs
    are CPU-uniform, so one wave beats two — measured: 64 partitions on 32
    cores costs the near-dup self-join ~45%) and DEFAULT file splitting
    (the headline's 4m maxPartitionBytes exists to file-grain the staged
    parse input; applied to the small documents/embeddings tables it
    shreds their scans into confetti tasks, ~35% on the same query).
    Production would do the same: parse jobs and dedup jobs do not share
    one conf.  Measured context: BENCH/BASELINE.md round-3 note."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("htmlgraft-bench-ops")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        # EXPLICIT defaults: builder confs from the parse session leak into
        # later sessions in the same JVM (verified: a fresh session after
        # _session() still reads maxPartitionBytes=4m), so the parse-tuned
        # file-graining must be actively reset, not just omitted
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.local.dir", "/dev/shm/spark-graft-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _noise_probe(n: int = 8_000_000) -> float:
    """Fixed single-thread integer spin — a window-quality thermometer.
    On a quiet box this takes a stable ~0.6-0.8 s; shared-host degradation
    (CPU steal, sustained co-tenant load) inflates it proportionally, so
    per-session probe times let a reader judge each measurement window and
    support the supplementary calibrated efficiency."""
    x = 0
    t0 = time.perf_counter()
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return round(time.perf_counter() - t0, 3)


def _stage_corpus(spark, sf_dir: str, sf: str, mult: int) -> str:
    """Stage the synthesized corpus to tmpfs parquet ONCE (outside timing):
    the headline measures the ENGINE (scan -> parse -> extract), not the SQL
    input synthesis; a real crawl input would already be at rest."""
    from htmlgraft.corpus import pages_df

    path = f"/dev/shm/spark-graft-pages-{sf}-x{mult}.parquet"
    if not os.path.isdir(path):
        pages_df(spark, sf_dir, multiplier=mult, num_parts=64).select(
            "url", "lang", "html"
        ).write.mode("overwrite").parquet(path)
    return path


def _run_parse(spark, pages_path: str, cpus: int, pre_partitioned: bool):
    from pyspark.sql import functions as F

    from htmlgraft.job import parse_extract

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


def _timed_parse(spark, pages_path: str, cpus: int, runs: int,
                 with_shuffled: bool = True):
    """Headline timing protocol: AQE off (its bytes-based coalescing cannot
    see per-row Python parse cost), one FULL uncounted warm pass (python
    worker imports + JVM JIT leave the first pass 2-3x slower than steady
    state), then `runs` timed passes of each path; headline = min over both
    the scan-direct and salted-shuffle variants.  The scaling levels skip
    the shuffled variant (only the headline stage reports it)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    _run_parse(spark, pages_path, cpus, True)  # deep warm, uncounted
    direct, shuffled = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        _run_parse(spark, pages_path, cpus, True)
        direct.append(round(time.perf_counter() - t0, 3))
    if with_shuffled:
        t0 = time.perf_counter()
        _run_parse(spark, pages_path, cpus, False)
        shuffled.append(round(time.perf_counter() - t0, 3))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return direct, shuffled


def _scaling_pair(pages_path: str, n_low: int, adaptive: bool = True) -> dict:
    """Measure one N -> 4N scaling pair on the staged corpus.

    The shared host has transient multi-second noise spikes that a
    13-second run absorbs as +30% wall — so each level runs in TWO
    interleaved sessions (decorrelated windows) and the efficiency uses
    the min per level across all runs.  NB the min/min ratio can overshoot
    1.0 when noise hits the two levels asymmetrically; the full run lists
    are reported alongside so the estimate is auditable.  Each session
    also records a fixed single-thread spin probe (quiet box ~0.6-0.8 s)
    and a probe-calibrated efficiency — wall times scaled by the session
    probe to remove sustained co-tenant degradation hitting one level's
    whole window; raw efficiency stays the primary number."""
    n_high = 4 * n_low
    pair = {n_high: [], n_low: []}
    probes = {n_high: [], n_low: []}
    cal = {n_high: [], n_low: []}

    def measure(levels):
        for level in levels:
            s = _session(level)
            s.sparkContext.setLogLevel("ERROR")
            p = _noise_probe()
            d, _sh = _timed_parse(
                s, pages_path, level, 3 if level == n_high else 2,
                with_shuffled=False,
            )
            pair[level].extend(d)
            probes[level].append(p)
            cal[level].extend(t / p for t in d)
            s.stop()

    measure((n_high, n_low, n_high, n_low))
    eff_initial = round(min(pair[n_low]) / (4 * min(pair[n_high])), 3)
    # Adaptive extension (gate pair only): a reading near the 0.8 gate is
    # exactly where one degraded window flips the verdict (noise inflating
    # t_4n lowers the ratio; inflating t_n raises it).  When the INITIAL
    # reading is near-gate (< 0.9), run a FIXED two more decorrelated
    # session pairs — unconditionally, no early exit, so there is no
    # optional-stopping rule that could only ever nudge a reading toward
    # passing (round-3 advice).  Every run stays in the reported lists and
    # the pre-extension ratio is emitted alongside the final one.  The
    # 8->32 saturation pair reads ~0.6 by design (documented in
    # BENCH/BASELINE.md) and must NOT trigger it.
    if adaptive and eff_initial < 0.9:
        measure((n_high, n_low))
        measure((n_high, n_low))
    return {
        "n_cores": n_low,
        "t_n": min(pair[n_low]),
        "t_4n": min(pair[n_high]),
        "t_n_runs": pair[n_low],
        "t_4n_runs": pair[n_high],
        "efficiency": round(min(pair[n_low]) / (4 * min(pair[n_high])), 3),
        "efficiency_initial": eff_initial,
        "probe_n": probes[n_low],
        "probe_4n": probes[n_high],
        "efficiency_calibrated": round(
            min(cal[n_low]) / (4 * min(cal[n_high])), 3
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # corpus multiplier: unions deterministic shifted copies so the parse
    # stage carries enough work to amortize fixed stage overheads
    mult = int(os.environ.get("SPARK_GRAFT_MULT", "30"))
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import functions as F

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from htmlgraft import eventops, linkops, pixelops, simops, textops

    pages_path = _stage_corpus(spark, sf_dir, sf, mult)
    pages = spark.read.parquet(pages_path)
    stats = pages.agg(
        F.count("*").alias("n"), F.sum(F.length("html")).alias("b")
    ).collect()[0]
    n_docs, n_bytes = stats["n"], stats["b"]

    timings: dict[str, float] = {}
    probes: dict[str, list[float]] = {"headline": [], "ops": []}
    probes["headline"].append(_noise_probe())
    direct, shuffled = _timed_parse(spark, pages_path, cpus, runs)
    probes["headline"].append(_noise_probe())
    timings["parse_extract"] = min(direct)
    timings["parse_extract_shuffled"] = min(shuffled)
    headline = min(timings["parse_extract"], timings["parse_extract_shuffled"])

    def timed(name, thunk):
        t0 = time.perf_counter()
        thunk()
        timings[name] = round(time.perf_counter() - t0, 3)

    if not os.environ.get("SPARK_GRAFT_HEADLINE_ONLY"):
        # operator timings run in their own relational-tuned session (see
        # _ops_session) — the parse-tuned confs measurably penalize them
        spark.stop()
        spark = _ops_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        # uncounted warm: fresh session -> python workers + JIT.  The link
        # warm-up wants a SMALL corpus (it pays a full parse); use the
        # smallest sf sibling of the configured dir if present, else the
        # dir itself (no hardcoded layout — round-3 advice)
        warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
        if not os.path.isdir(warm_dir):
            warm_dir = sf_dir
        textops.run(spark, sf_dir, textops.simhash_sql).count()
        linkops.run_extract_links(spark, warm_dir).count()
        probes["ops"].append(_noise_probe())
        timed(
            "dedup_minhash_lsh",
            lambda: textops.run_minhash_lsh(spark, sf_dir).count(),
        )
        timed(
            "dedup_simhash",
            lambda: textops.run(spark, sf_dir, textops.simhash_sql).count(),
        )
        timed(
            # the production runner (repartitioned scan + persisted simhash
            # relation) — the same path the driver query uses; timing the
            # raw SQL template instead silently re-measures the round-2
            # scan-parallelism trap the runner exists to fix (~4x)
            "dedup_simhash_neardup",
            lambda: textops.run_simhash_neardup(spark, sf_dir).count(),
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
        timed(
            "extract_links",
            lambda: linkops.run_extract_links(spark, sf_dir).count(),
        )
        timed(
            "pagerank_hosts",  # full chain: parse -> links -> graph -> 5 iters
            lambda: linkops.run_pagerank_hosts(spark, sf_dir).count(),
        )
        timed(
            "pii_scrub",
            lambda: textops.run(spark, sf_dir, textops.pii_scrub_sql).count(),
        )
        timed(
            "substring_dedup",
            lambda: textops.run(spark, sf_dir, textops.substring_dedup_sql).count(),
        )
        timed(
            "quality_classify",
            lambda: textops.run(
                spark, sf_dir, textops.quality_classify_sql
            ).count(),
        )
        timed(
            "winnow_fingerprint",
            lambda: textops.run(
                spark, sf_dir, textops.winnow_fingerprint_sql
            ).count(),
        )
        timed(
            "gopher_filter",
            lambda: textops.run(
                spark, sf_dir, textops.gopher_filter_sql
            ).count(),
        )
        timed(
            "bm25_search",  # persisted-tf production runner
            lambda: textops.run_bm25_search(spark, sf_dir).count(),
        )
        timed(
            "filter_funnel",
            lambda: textops.run(
                spark, sf_dir, textops.filter_funnel_sql
            ).count(),
        )
        timed(
            "kn_ngram",  # persisted bigram-counts production runner
            lambda: textops.run_kn_ngram(spark, sf_dir).count(),
        )
        timed(
            "events_asof",
            lambda: eventops.run(
                spark, sf_dir, eventops.asof_join_sql
            ).count(),
        )
        timed(
            "ngram_novelty",  # persisted shingle production runner
            lambda: textops.run_ngram_novelty(spark, sf_dir).count(),
        )
        timed(
            # round-5 JPEG tier: real entropy encode -> full baseline
            # decode (Huffman + DPCM + dequant + integer IDCT) -> dHash;
            # times the dominant crawl-image perceptual-dedup path
            "pixel_phash_jpeg",
            lambda: pixelops.pixel_phash_jpeg(spark, sf_dir).count(),
        )
        probes["ops"].append(_noise_probe())
    spark.stop()

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
        "parse_runs": direct + shuffled,
        # fixed single-thread spin before/after each block (quiet ~0.6-0.8 s;
        # a 2x probe means the surrounding numbers sat in a degraded window)
        "window_probes": probes,
        "mult": mult,
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        # north-rule scaling evidence: identical job + input at N and 4N
        # cores.  BOTH candidate pairs are measured and emitted every run
        # (machine-checkable, per the round-2 adjudication): 4->16 is the
        # primary (unsaturated — on a real cluster N->4N multiplies NODES,
        # keeping per-core conditions identical, which this box only
        # reproduces below ~16 active cores), and 8->32 is reported raw
        # alongside (it saturates the box: driver JVM + 32 pinned workers
        # oversubscribe, and per-core clock drops ~20% — the
        # zero-Spark multiprocessing control in BENCH/trials_r2.txt pins
        # the limiter on the hardware, 0.745 spin efficiency at 8->32).
        out["scaling_4_16"] = _scaling_pair(pages_path, 4)
        out["scaling_8_32"] = _scaling_pair(pages_path, 8, adaptive=False)
        out["scaling"] = out["scaling_4_16"]  # primary, kept for r1/r2 compat

    sys.stdout.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
