#!/usr/bin/env python3
"""Per-query isolation bench (optimization round; bench.py stays frozen).

Times individual ``queries()`` entries through the same noop-sink
methodology as bench.py, with optional repeats, job labels, and
``.explain("formatted")`` capture. Prints one JSON line.

Usage:
    python bench_extra.py [query ...]          # default: all queries
Env:
    SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     cores (default 32)
    BENCH_EXTRA_REPEATS  timings per query (default 1)
    BENCH_EXTRA_EXPLAIN  dir to write <query>.txt explain files (optional)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))
EXPLAIN_DIR = os.environ.get("BENCH_EXTRA_EXPLAIN")


def main():
    import __spark_entry__ as entry
    from go_boilerpipe_spark.spark_session import build_session

    wanted = sys.argv[1:] or None
    spark = build_session(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    out = {}
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _warm(s):
            return s * 1.0

        spark.range(4 * CPUS).repartition(2 * CPUS).select(
            _warm(F.col("id").cast("double"))
        ).write.format("noop").mode("overwrite").save()

        qs = entry.queries()
        for name, fn in qs.items():
            if wanted and name not in wanted:
                continue
            if EXPLAIN_DIR:
                pathlib.Path(EXPLAIN_DIR).mkdir(parents=True, exist_ok=True)
                df = fn(spark, SF_DIR)
                with open(f"{EXPLAIN_DIR}/{name}.txt", "w") as f:
                    f.write(df._sc is not None and df._jdf.queryExecution()
                            .explainString(
                                spark._jvm.org.apache.spark.sql.execution
                                .ExplainMode.fromString("formatted")) or "")
            times = []
            for _ in range(REPEATS):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times.append(round(time.monotonic() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            out[name] = {"min": min(times), "times": times}
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
