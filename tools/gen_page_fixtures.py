"""Sample synthesized corpus pages to fixtures/pages_sample.jsonl so that
tools/gen_fixtures.mjs can run the *reference* parser over realistic pages.

Usage: python tools/gen_page_fixtures.py   (then: node tools/gen_fixtures.mjs)
"""

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from htmlgraft.corpus import pages_df

    pages = pages_df(spark, "/root/testdata/sf0.001")
    rows = pages.select("url", "html", "doc_id").collect()
    rows.sort(key=lambda r: r["doc_id"])
    with open("fixtures/pages_sample.jsonl", "w", encoding="utf-8") as f:
        for r in rows:
            if r["doc_id"] % 8 != 0 and r["doc_id"] % 199 != 0:
                continue  # every 8th page + all oversized pages
            f.write(
                json.dumps(
                    {"url": r["url"], "html": bytes(r["html"]).decode("utf-8")},
                    ensure_ascii=False,
                )
                + "\n"
            )
    spark.stop()
    print("wrote fixtures/pages_sample.jsonl")


if __name__ == "__main__":
    main()
