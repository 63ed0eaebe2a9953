"""End-to-end spark-submit --py-files deployment test: package htmlgraft.zip,
submit the real job entry against a small parquet input in a fresh JVM, and
check the results + compact state sinks — the north rule's production shape
(`spark-submit --py-files htmlgraft.zip -m htmlgraft.job ...`)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this machine"
)
def test_spark_submit_pyfiles_roundtrip(spark, sf_dir, tmp_path):
    from htmlgraft.corpus import pages_df

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "htmlgraft.zip"))
    pages_in = str(tmp_path / "pages_in.parquet")
    pages_df(spark, sf_dir).limit(60).select("url", "lang", "html").write.parquet(
        pages_in
    )
    out_dir = str(tmp_path / "state")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--input", pages_in,
            "--out", out_dir,
            "--run-id", "submit1",
            "--parts", "4",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "results: 60 rows" in proc.stdout
    res = spark.read.parquet(out_dir + "/results")
    assert res.count() == 60
    assert res.where("n_errors > 0").count() == 0
    state = spark.read.parquet(out_dir + "/state_urls")
    assert state.count() == 60
