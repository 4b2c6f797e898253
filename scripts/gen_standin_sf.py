#!/usr/bin/env python3
"""Generate a MEASUREMENT-ONLY stand-in for a driver scale factor.

The driver generates its own deterministic testdata (TESTDATA.md); the
larger SFs it measures with (e.g. sf1.0 in BENCH_r05.json) are not kept
on disk between rounds. This script synthesizes tables with the same
schemas, cardinalities and distribution SHAPE (vocab, lengths, key
ranges, dup rate, unit-norm embeddings) inferred from the committed
sf0.001/0.01/0.1 sets, so optimization A/Bs can run at the driver's
measurement scale. The values do NOT match the driver's data — never
use this for correctness checks, only for timing.

Usage: python scripts/gen_standin_sf.py <sf> <out_dir>
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_events = max(1000, int(1_000_000 * sf))
    n_li = int(6_000_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = max(100, int(10_000 * sf))
    n_users = max(150, int(15_000 * sf))

    # documents: word salad, ~0.16% exact dups (8/5000 at sf0.1)
    wc = rng.integers(8, 101, n_docs)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in wc]
    n_dup = max(0, int(round(n_docs * 8 / 5000)))
    for i in rng.integers(0, n_docs, n_dup):
        texts[int(i)] = texts[int(rng.integers(0, n_docs))]
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": rng.choice(LANGS, n_docs, p=LANG_P),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm float32, dim 64, labels 0-9
    V = rng.standard_normal((n_emb, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int64()),
    }))

    # events: 30 days, uniform users, exp(50) values
    base = np.datetime64("2024-01-01T00:00:00.000000")
    ts = base + (rng.random(n_events) * 30 * 86_400e6).astype("timedelta64[us]")
    write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": rng.choice(
            ["signup", "purchase", "view", "click", "error"], n_events),
        "value": np.round(rng.exponential(50.0, n_events), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
    }))

    # TPC-H-ish star tables
    day = 86_400
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1000, 100_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["R", "A", "N"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": pa.array(
            np.datetime64("1995-01-01")
            + rng.integers(0, 2500, n_li).astype("timedelta64[D]"),
            pa.timestamp("us")),
    }))
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_orders),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": pa.array(
            np.datetime64("1995-01-01")
            + rng.integers(0, 1500, n_orders).astype("timedelta64[D]"),
            pa.date32()),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_orders),
    }))
    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int64()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
            n_cust),
    }))
    adjectives = ["large", "hot", "small", "cold", "red", "blue", "green"]
    nouns = ["ring", "bolt", "case", "drum", "plate", "wheel", "cap"]
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{adjectives[i % 7]} {nouns[(i // 7) % 7]}"
                   for i in range(n_part)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": rng.choice(
            ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"],
            n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int64()),
        "p_retailprice": np.round(900 + 0.1 * np.arange(n_part), 1),
    }))
    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int64()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    nations = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
        "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
        "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
        "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
        "UNITED STATES",
    ]
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": nations,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
    }))
    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))


if __name__ == "__main__":
    main()
