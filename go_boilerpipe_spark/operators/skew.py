"""Skew-handling utilities: salted two-phase aggregation.

Low-cardinality or heavy-hitter group keys (event types, hosts owning
half the crawl) funnel a whole key into one reducer. Salting splits each
key into ``n_salts`` shards for a partial aggregate, then re-aggregates
the shards — the classic two-phase combine, expressed so Catalyst keeps
both phases map-side-combinable. AQE's skew handling covers *join* skew;
this covers aggregation skew, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salted keys.

    ``aggs`` maps output column → ("sum" | "count" | "min" | "max", expr).
    Only re-aggregatable functions are allowed (that's what makes the
    two-phase split exact). Averages: derive from sum+count afterwards.
    """
    salt = (F.spark_partition_id() % n_salts).alias("_salt")

    phase1_aggs = []
    phase2_aggs = []
    for out, (fn, expr) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(expr).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(expr).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(expr).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(expr).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"{fn} is not re-aggregatable")

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)
