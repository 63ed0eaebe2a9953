#!/usr/bin/env python
"""Scale audit: flag every registry query whose physical plan contains a
Window fed by Exchange SinglePartition — the shape that becomes a one-task
sort over an unbounded relation at 10^12 docs (the round-3 vocab_induct
finding, fixed via textops.global_topk_cand).

Allowlist (single-partition windows whose INPUT is structurally bounded by
a value domain, not by the corpus):

* ppl_bucket — the cumulative-threshold windows run over the histogram of
  the length-normalized score, whose domain is [0, LM_SCALE] (~10^6 rows
  max regardless of corpus size; see ppl_bucket_sql docstring).

Exit non-zero if anything OUTSIDE the allowlist flags.

Usage: python tools/window_audit.py [sf_dir]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALLOWLIST = {"ppl_bucket"}


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    flagged = {}
    for name, fn in E.queries().items():
        try:
            plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # a query that cannot even plan is a finding
            flagged[name] = [f"ERROR {type(e).__name__}: {str(e)[:120]}"]
            continue
        lines = plan.splitlines()
        hits = []
        for i, ln in enumerate(lines):
            if re.search(r"\bWindow\b", ln) and "WindowGroupLimit" not in ln:
                for j in range(i + 1, min(i + 12, len(lines))):
                    if "Exchange SinglePartition" in lines[j]:
                        hits.append(ln.strip()[:110])
                        break
                    if "Exchange hashpartitioning" in lines[j]:
                        break
        if hits:
            flagged[name] = hits
    bad = {k: v for k, v in flagged.items() if k not in ALLOWLIST}
    for name, hits in sorted(flagged.items()):
        tag = "ALLOWED" if name in ALLOWLIST else "FLAGGED"
        print(f"{tag} {name}: {len(hits)} single-partition window(s)")
        for h in hits:
            print("   ", h)
    print(f"window audit: {len(flagged)} flagged, {len(bad)} outside allowlist,"
          f" {len(E.queries())} queries")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
