"""Streaming url-dedup for the crawl-ingestion path.

A 10^12-page crawl stream re-fetches urls (recrawls, mirrors, redirect
aliases); dropping repeats at ingestion keeps every downstream stage from
paying for them. Two engine-native strategies, both with bounded state:

- :func:`dedup_stream_exact` — ``dropDuplicatesWithinWatermark`` on the
  (normalized) url: engine-managed state store, entries evicted once the
  event-time watermark passes them, so state is bounded by the recrawl
  horizon rather than the corpus size.
- batch-side of the same contract is ``operators.dedup.exact_dedup``;
  the streaming form trades exactness beyond the watermark horizon for
  O(horizon) state — the standard design at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import normalize_url


def dedup_stream_exact(
    pages: DataFrame,
    late: str = "2 hours",
    key: str = "url",
    normalize: bool = True,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Drop repeated urls from a streaming pages DataFrame.

    ``late`` is the event-time watermark: a url seen again within the
    watermark window is dropped; beyond it the state entry has been
    evicted (bounded state — the crawl-scale contract). ``normalize``
    keys on the Catalyst normalize_url twin so trivial url aliases
    (fragment, dup slashes, dot-segments) dedup together."""
    keyed = pages.withColumn(
        "_dedup_key", normalize_url(F.col(key)) if normalize else F.col(key)
    )
    return (
        keyed.withWatermark(ts_col, late)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )
