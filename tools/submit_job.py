#!/usr/bin/env python
"""spark-submit launcher for the parse+extract job:

    python tools/make_pyfiles_zip.py
    spark-submit --py-files htmlgraft.zip tools/submit_job.py \
        --input <pages parquet/iceberg> --out <state dir> [--run-id r1] ...

The htmlgraft package itself arrives via --py-files (executors' Python
workers import it from the zip); this file is only the driver-side entry
(spark-submit cannot run a module inside a zip directly)."""

from htmlgraft.job import main

if __name__ == "__main__":
    main()
