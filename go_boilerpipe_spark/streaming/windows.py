"""Event-time windowed aggregation with watermarks.

The extraction pipeline itself has no event-time semantics (SURVEY.md
§2.5), but crawl-rate monitoring does: tumbling-window doc counts on
``warc_ts`` with a watermark bounding late-data state. This is the
engine's standard watermark surface — state is dropped once the watermark
passes a window's end, which is what keeps a 10^12-row stream's state
finite."""

from __future__ import annotations

from pyspark.sql import functions as F


def windowed_counts(stream_df, ts_col: str = "warc_ts",
                    window_len: str = "1 hour", late: str = "2 hours"):
    """Tumbling-window row counts per language with a late-data watermark."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        stream_df.withColumn("_ts", ts)
        .withWatermark("_ts", late)
        .groupBy(F.window("_ts", window_len).alias("win"), F.col("lang"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "lang",
            "n_docs",
        )
    )
