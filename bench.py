#!/usr/bin/env python3
"""Benchmark harness: prints ONE JSON line with the headline metrics.

- Extraction throughput (the north-rule metric, docs/sec) over a
  deterministic synthesized Common-Crawl-style corpus (skewed host
  distribution, ~47 KB avg html) at local[CPUS].
- Two-cluster-size scaling evidence (BASELINE.md protocol): the same job
  at N and 4N cores. The headline pair is N=2 → 4N=8 on the 32-core box —
  the cluster-faithful proxy, since on a real cluster 4N executors bring
  4× the hardware, which a shared single box can only emulate while both
  runs stay below its bandwidth/oversubscription ceiling. The CPUS-core
  run is additionally reported as the saturation point.
- Per-run Python workers are warmed before timing (startup excluded per
  protocol) and an order-independent output checksum proves the runs are
  partition-invariant.
- Every queries() entry timed at $SPARK_GRAFT_SF_DIR (default sf0.1),
  forced via the noop sink.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_DOCS (default 12000), SPARK_GRAFT_BENCH_SCALING=0 to
skip the scaling runs.
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
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "12000"))
# scaling pairs run on a larger corpus so the N=local[2] side stays >=120 s
# (VERDICT r2 item 6): with the compiled kernel the N side clears ~2000
# docs/s, so 288k docs keep the run long enough that transient ambient
# spikes and fixed costs stay <3% of the measured ratio
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "288000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
REPO = pathlib.Path(__file__).resolve().parent


def _proc_stat() -> dict:
    """System-wide CPU counters (seconds): busy = user+nice+system+irq+
    softirq; steal = time the HYPERVISOR ran someone else on our vCPUs.
    Steal is the failure mode loadavg cannot see — stolen time adds no
    runnable tasks, so a steal wave crushes a wide run while every load
    gauge reads clean (round-5 attribution of the '>8-core inversion')."""
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:9]]
    hz = os.sysconf("SC_CLK_TCK")
    return {"busy": (v[0] + v[1] + v[2] + v[5] + v[6]) / hz, "steal": v[7] / hz}


def _own_tree_cpu() -> float:
    """CPU seconds consumed so far by this process and every descendant
    (the JVM and its pyspark.daemon workers are children of this driver).
    One /proc scan; ancestry walked through the ppid chain."""
    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    info = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(") ", 1)[1].split()
            info[int(d)] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / hz)
        except OSError:
            continue
    total = 0.0
    for pid, (ppid, cpu) in info.items():
        p, hops = pid, 0
        while p > 1 and p != me and hops < 64:
            p = info.get(p, (0, 0.0))[0]
            hops += 1
        if p == me:
            total += cpu
    return total


def _ensure_corpus(spark, n_docs: int) -> str:
    corpus_dir = REPO / "BENCH" / f"corpus_{n_docs}_skew"
    marker = corpus_dir / "_SUCCESS"
    if not marker.exists():
        from go_boilerpipe_spark.sources.pages import synthesize_pages

        df = synthesize_pages(spark, n_docs, skew=True, null_html_every=1000,
                              partitions=128)
        df.repartition(128).write.mode("overwrite").parquet(str(corpus_dir))
    return str(corpus_dir)


def _extract_bench(cores: int, n_docs: int = N_DOCS, halve: bool = False,
                   trials: int = 2) -> dict:
    """Timed extraction at local[cores]; workers warmed, best of trials.

    ``halve`` selects a deterministic ~50% subset via a url-hash filter —
    fully parallel (a LIMIT would funnel rows through a serial global-limit
    stage, which distorts the N vs 4N comparison once the kernel is fast)."""
    from pyspark.sql import functions as F

    from go_boilerpipe_spark.operators.extract import extract_articles
    from go_boilerpipe_spark.spark_session import build_session

    spark = build_session(
        app_name=f"bench-extract-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 8),
    )
    try:
        corpus = _ensure_corpus(spark, n_docs)
        pages = spark.read.parquet(corpus).filter(F.col("html").isNotNull())
        if halve:
            pages = pages.filter(F.xxhash64("url") % 2 == 0)
        extracted = extract_articles(pages, parallelism=4 * cores)

        def run():
            return extracted.agg(
                F.count("*").alias("docs"),
                F.sum(F.length("content")).alias("chars"),
                F.sum(
                    F.conv(
                        F.substring(F.md5(F.col("content").cast("binary")), 1, 8),
                        16, 10,
                    ).cast("long")
                ).alias("checksum"),
                F.sum(
                    F.when(F.col("parse_error").isNotNull(), 1).otherwise(0)
                ).alias("errors"),
            ).collect()[0]

        # spin up all python workers on a small repartitioned slice
        extract_articles(
            spark.read.parquet(corpus).limit(16 * cores),
            parallelism=4 * cores,
        ).count()

        load_before = os.getloadavg()[0]
        stat0, own0 = _proc_stat(), _own_tree_cpu()
        region0 = time.monotonic()
        best, row = None, None
        for _ in range(trials):
            t0 = time.monotonic()
            row = run()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        region = time.monotonic() - region0
        stat1, own1 = _proc_stat(), _own_tree_cpu()
        # exact contention telemetry over the timed region, normalized to
        # average cores: steal = hypervisor ran another guest on our
        # vCPUs; foreign = other processes on THIS guest. Either one >~1
        # core during a saturated run means the reading measured the
        # neighborhood, not the engine (round-5 attribution: the r3/r4
        # "inversion" was exactly such waves, invisible to loadavg once
        # own cores == machine cores).
        steal_cores = (stat1["steal"] - stat0["steal"]) / region
        foreign_cores = max(
            (stat1["busy"] - stat0["busy"]) - (own1 - own0), 0.0
        ) / region
        return {
            "cores": cores,
            "docs": row["docs"],
            "checksum": int(row["checksum"]),
            "errors": int(row["errors"] or 0),
            "wall_sec": round(best, 3),
            "docs_per_sec": round(row["docs"] / best, 2),
            # ambient-load telemetry (VERDICT r3 item 7): 1-min loadavg
            # around the timed region; load_after minus our own core count
            # approximates foreign load during the run (a saturated run of
            # >=2x the 60s time constant drives loadavg ~= own cores)
            "load_before": round(load_before, 2),
            "load_after": round(os.getloadavg()[0], 2),
            "steal_cores": round(steal_cores, 2),
            "foreign_cores": round(foreign_cores, 2),
        }
    finally:
        spark.stop()


def _query_bench() -> tuple[dict, float]:
    import __spark_entry__ as entry
    from go_boilerpipe_spark.spark_session import build_session

    spark = build_session(
        app_name="bench-queries",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    timings = {}
    total = 0.0
    try:
        # pre-warm the Python/Arrow workers (mirrors the extraction bench):
        # the FIRST pandas_udf job in a session pays worker fork + Arrow
        # serializer init (~1s+ per core wave) — in r3 that one-time cost
        # landed entirely on ann_cosine_topk (first pandas_udf query in
        # suite order) and read as a 2.1x "regression" (VERDICT r3 item 2;
        # interleaved A/B showed the batched scorer is actually FASTER
        # than the fold at every scale: 0.57 vs 0.65 s at sf0.1, 2.3x at
        # 100x). Steady-state per-query latency is the metric.
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _warm(s):
            return s * 1.0

        spark.range(4 * CPUS).repartition(2 * CPUS).select(
            _warm(F.col("id").cast("double"))
        ).write.format("noop").mode("overwrite").save()

        for name, fn in entry.queries().items():
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            timings[name] = round(dt, 3)
            total += dt
    finally:
        spark.stop()
    return timings, total


def main():
    big = _extract_bench(CPUS)
    # the scaling-size skew corpus at saturation (VERDICT r2 item 10):
    # records the big-corpus rate next to the 12k headline so both scales
    # are on file (corpus size = SCALING_DOCS, recorded as scaling_docs)
    bigsc = _extract_bench(CPUS, n_docs=SCALING_DOCS) if DO_SCALING else None
    scaling = None
    if DO_SCALING:
        # PAIRED runs: (a) ambient load on a shared box moves absolute
        # rates ±25%, so N and 4N are measured back-to-back under the
        # same load, with alternating within-pair order so a monotonic
        # load drift cannot bias all pairs the same way; the median pair
        # is reported. (b) trials=2 per level with min-time: the FIRST
        # execution of a plan pays whole-stage-codegen/JIT compile (~1-2
        # s), a fixed cost that eats ~8% of the short 4N run but ~2% of
        # the long N run — timing only first executions structurally
        # depresses the ratio.
        # (c) the scaling corpus (SCALING_DOCS, default 288k) makes the
        # N=local[2] run >=120 s — at that length the ~1-2 s first-plan
        # compile is <2%, so a single timed run per side suffices
        # (workers pre-warmed).
        # (d) ambient-load flagging (VERDICT r3 item 7): a side whose
        # end-of-run 1-min loadavg exceeds its own core count by more
        # than SPARK_GRAFT_LOAD_EXCESS (default 3.0 — own load drives
        # loadavg ~= cores after >=2 time constants, plus ~1 of decay
        # carryover from the sibling side) indicates foreign CPU during
        # the timed region; flagged pairs are rerun once and excluded
        # from the median when any clean pair exists.
        n_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "5"))
        # r5 (VERDICT r4 item 3): default tightened 3.0 -> 1.0 — run 6's
        # 0.671-efficiency first pair had excess 1.18 and went unflagged.
        # loadavg is now the COARSE gauge; the precise per-run flags are
        # steal_cores/foreign_cores measured over the timed region, which
        # see contention loadavg structurally cannot (hypervisor steal
        # adds no runnable tasks; foreign load is masked once own cores
        # == machine cores).
        load_excess = float(os.environ.get("SPARK_GRAFT_LOAD_EXCESS", "1.0"))
        contention_cores = float(
            os.environ.get("SPARK_GRAFT_CONTENTION_CORES", "1.0")
        )

        def run_pair(p):
            # settle between sessions: let the previous JVM fully exit and
            # the OS reclaim its pages — teardown bleeding into the next
            # timed run showed up as low first-pair outliers
            time.sleep(5)
            if p % 2 == 0:
                n1 = _extract_bench(2, n_docs=SCALING_DOCS, trials=1)
                n4 = _extract_bench(8, n_docs=SCALING_DOCS, trials=1)
            else:
                n4 = _extract_bench(8, n_docs=SCALING_DOCS, trials=1)
                n1 = _extract_bench(2, n_docs=SCALING_DOCS, trials=1)
            excess = max(n1["load_after"] - n1["cores"],
                         n4["load_after"] - n4["cores"])
            contention = max(
                n1["steal_cores"] + n1["foreign_cores"],
                n4["steal_cores"] + n4["foreign_cores"],
            )
            return (n1, n4,
                    (n4["docs_per_sec"] / n1["docs_per_sec"]) / 4.0,
                    round(excess, 2), round(contention, 2))

        # drain the saturation phase's loadavg before the first timed
        # pair: the 1-min EMA needs ~1-2 time constants to decay from
        # the 32-core run, and a pair started hot reads as false
        # super-/sub-linear (run-1 r4: first pair load_before 35.4,
        # eff 1.03). Gate: wait until loadavg is near the pair's own
        # core budget, capped so a genuinely busy box still proceeds.
        drain_deadline = time.time() + float(
            os.environ.get("SPARK_GRAFT_SETTLE_MAX", "120")
        )
        while (os.getloadavg()[0] > 8 + load_excess
               and time.time() < drain_deadline):
            time.sleep(5)

        def _flagged(p):
            return p[3] > load_excess or p[4] > contention_cores

        pairs, reruns = [], 0
        for p in range(n_pairs):
            pair = run_pair(p)
            if _flagged(pair):  # foreign load or steal: one rerun
                reruns += 1
                pair = run_pair(p)
            pairs.append(pair)
        in_order = [round(p[2], 3) for p in pairs]  # execution order
        loads = [
            {"eff": round(p[2], 3), "load_excess": p[3],
             "contention_cores": p[4],
             "n_load": [p[0]["load_before"], p[0]["load_after"]],
             "n4_load": [p[1]["load_before"], p[1]["load_after"]],
             "n_steal": p[0]["steal_cores"], "n4_steal": p[1]["steal_cores"],
             "n_foreign": p[0]["foreign_cores"],
             "n4_foreign": p[1]["foreign_cores"],
             "flagged": _flagged(p)}
            for p in pairs
        ]
        clean = [p for p in pairs if not _flagged(p)] or pairs
        clean.sort(key=lambda p: p[2])
        n1, n4, eff = clean[len(clean) // 2][:3]  # median clean pair
        scaling = {
            "n_cores": 2,
            "n4_cores": 8,
            "docs_per_sec_n": n1["docs_per_sec"],
            "docs_per_sec_4n": n4["docs_per_sec"],
            "efficiency": round(eff, 3),
            "efficiency_pairs": in_order,
            "pair_loads": loads,
            "flagged_pairs": sum(1 for p in pairs if _flagged(p)),
            "flagged_reruns": reruns,
            "output_identical": n1["checksum"] == n4["checksum"]
            and n1["docs"] == n4["docs"],
            "scaling_docs": SCALING_DOCS,
            "saturation_cores": CPUS,
            "saturation_docs_per_sec": big["docs_per_sec"],
            # saturation-run contention record (round-5): a wide run with
            # steal/foreign > ~1 core measured its neighbors, not the
            # engine — the r3/r4 "inversion" readings carried no such
            # telemetry and are superseded by flagged measurements
            "saturation_steal_cores": big["steal_cores"],
            "saturation_foreign_cores": big["foreign_cores"],
            "saturation_288k": (
                {
                    "docs_per_sec": bigsc["docs_per_sec"],
                    "steal_cores": bigsc["steal_cores"],
                    "foreign_cores": bigsc["foreign_cores"],
                }
                if bigsc
                else None
            ),
        }

    queries, total_q = _query_bench()

    out = {
        "metric": "suite seconds (extraction corpus + operator queries); "
                  "extract_docs_per_sec is the north-rule throughput",
        "value": round(big["wall_sec"] + total_q, 3),
        "unit": "sec",
        "queries": {"extract_corpus": big["wall_sec"], **queries},
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "extract_docs": big["docs"],
        "extract_docs_per_sec": big["docs_per_sec"],
        "extract_parse_errors": big["errors"],
        "extract_docs_per_sec_scaling": (
            bigsc["docs_per_sec"] if bigsc else None
        ),
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
