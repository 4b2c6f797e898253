"""spark-submit entry point: the CLI of the engine.

The Spark equivalent of the reference CLI (`boilerpipe extract
[path|url]`, cmd/boilerpipe/extract.go:31-82): arg parsing maps to job
config; stdin/file/url acquisition is replaced by the table scan.

    spark-submit --py-files dist/go_boilerpipe_spark.zip \
        -m go_boilerpipe_spark.jobs.extract \
        --source /data/pages --sink /data/extracted \
        [--streaming] [--langs en,zh] [--parallelism 4096] \
        [--chunk-bytes 1073741824] [--no-repartition]

Batch mode uses the checkpoint-resumable chunked job; --streaming uses the
Trigger.AvailableNow structured-streaming drain. Both are idempotent
re-run-to-resume.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="boilerpipe-spark extraction job")
    ap.add_argument("--source", required=True, help="pages table path")
    ap.add_argument("--sink", required=True, help="output table path")
    ap.add_argument("--streaming", action="store_true",
                    help="use Structured Streaming (Trigger.AvailableNow)")
    ap.add_argument("--langs", default=None,
                    help="comma-separated lang filter (pushed to the scan)")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--chunk-bytes", type=int, default=1 << 30)
    ap.add_argument("--no-repartition", action="store_true",
                    help="skip the xxhash64(url) shuffle (uniform sources)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from ..spark_session import build_session

    spark = build_session(app_name="boilerpipe-extract", master=args.master)
    langs = tuple(args.langs.split(",")) if args.langs else None

    if args.streaming:
        from ..streaming.extract_stream import run_extract_stream

        ok = run_extract_stream(
            spark, args.source, args.sink, parallelism=args.parallelism
        )
        print(json.dumps({"mode": "streaming", "drained": bool(ok)}))
    else:
        from ..plans.extract_job import ExtractJob

        job = ExtractJob(
            spark,
            args.source,
            args.sink,
            parallelism=args.parallelism,
            chunk_target_bytes=args.chunk_bytes,
            repartition=not args.no_repartition,
            langs=langs,
        )
        stats = job.run()
        print(json.dumps({"mode": "batch", **stats}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
