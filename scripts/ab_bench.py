"""Commit-level A/B measurement for named fleet entries — the
established attribution protocol (bench-identical session, JVM +
Python-worker warm-up, N reps, ``clearCache()`` between queries,
medians), runnable against any checkout so a suspect query can be
timed on HEAD and on an unchanged-code tree in a worktree back to
back.

Usage (from the tree to measure):
    python scripts/ab_bench.py pmi_docs cusum_orders acf_events
    SPARK_GRAFT_BENCH_REPS=4 python scripts/ab_bench.py pmi_docs

Always appends the TPC-H anchor queries (q1, q6) so every A/B carries
its own box-state reference — a pair of runs is comparable only after
dividing by the anchor ratio (see scripts/bench_diff.py's round-12
normalization).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ANCHORS = ["q1_pricing_summary", "q6_forecast_revenue"]


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: ab_bench.py QUERY [QUERY ...]", file=sys.stderr)
        return 2
    from bench import build_spark

    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4")))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    # identical warm-up to bench.py
    try:
        entry_mod.entry(spark).write.format("noop") \
            .mode("overwrite").save()
    except Exception:
        pass
    try:
        import pandas as _pd
        from pyspark.sql.functions import col, pandas_udf

        @pandas_udf("long")
        def _warm(x: _pd.Series) -> _pd.Series:
            return x

        spark.range(int(cpus) * 4).repartition(int(cpus)).select(
            _warm(col("id"))).write.format("noop") \
            .mode("overwrite").save()
    except Exception:
        pass

    out = {}
    for name in names + [a for a in ANCHORS if a in queries
                         and a not in names]:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        out[name] = {"median": round(statistics.median(runs), 3),
                     "samples": runs}
        print(f"# {name}: {out[name]['median']}s {runs}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps,
                      "results": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
