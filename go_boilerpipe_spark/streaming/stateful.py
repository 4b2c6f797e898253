"""Custom stateful streaming operator: per-host running extraction stats.

The boilerpipe computation itself needs no cross-document state
(SURVEY.md §2.5), but a production crawl pipeline tracks per-host
counters across micro-batches (docs seen, content yield, error rate) to
drive fetch/extract policy. This demonstrates the engine's stateful
surface: ``applyInPandasWithState`` with GroupState, update-mode output,
processing-time timeouts for host expiry.

State schema: (docs long, content_chars long, errors long).
Output per updated host per batch: running totals.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

OUTPUT_SCHEMA = (
    "host string, docs long, content_chars long, errors long"
)
STATE_SCHEMA = "docs long, content_chars long, errors long"


def _make_update_fn(idle_timeout_ms: int):
    def update_host_stats(key, pdfs: Iterable[pd.DataFrame], state):
        """GroupState update function (one host per call)."""
        if state.hasTimedOut:
            state.remove()
            return
        docs = chars = errs = 0
        if state.exists:
            docs, chars, errs = state.get
        for pdf in pdfs:
            docs += len(pdf)
            chars += int(pdf["content_chars"].sum())
            errs += int(pdf["is_error"].sum())
        state.update((docs, chars, errs))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "docs": [docs],
                "content_chars": [chars],
                "errors": [errs],
            }
        )

    return update_host_stats


def host_stats_stream(extracted_stream, idle_timeout_ms: int = 0):
    """Attach the stateful per-host rollup to a streaming extracted
    DataFrame (url, content, parse_error, ...).

    ``idle_timeout_ms`` > 0 expires idle hosts via processing-time
    timeouts — use it for continuous (micro-batch) deployments. Leave 0
    for ``Trigger.AvailableNow`` drains: registered timeouts make the
    engine keep scheduling empty batches, so the drain never terminates."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = extracted_stream.select(
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.coalesce(F.length("content"), F.lit(0)).alias("content_chars"),
        F.col("parse_error").isNotNull().cast("int").alias("is_error"),
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
