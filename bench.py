"""Benchmark harness: runs the engine's query fleet at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"samples": {name: [sec, ...]}, "queries": {name: sec}, "sf",
"reps", "metric", "value" (total sec), "unit"}.

Key order is deliberate: the headline (metric/value) keys sit at the END
of the line, so any fixed-size TAIL capture of the output (the driver
keeps the last ~2000 chars) always retains the fleet total even though
the full per-query detail exceeds it.  Per-query progress goes to
stderr, never stdout — stdout is exactly one JSON line.

Each query executes via the noop sink (full computation, no driver
collect, no filesystem write skew) after a warm-up of the session JVM.
Each query is timed $SPARK_GRAFT_BENCH_REPS times (default 3) and the
per-query number reported in "queries" is the MEDIAN of those samples;
the raw samples are kept in "samples" so run-to-run noise (JIT compile,
Python worker churn, system load) is visible instead of aliasing into
the single reported figure.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from pyspark.sql import SparkSession


def build_spark(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tap-airbyte-wrapper-spark-bench")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry_mod

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # JVM/codegen warm-up on the smallest SF so per-query timings measure
    # the plan, not first-call JIT.
    try:
        entry_mod.entry(spark).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    # Python/Arrow worker warm-up: the first pandas-UDF query otherwise
    # pays ~2-4s of daemon spawn + Arrow init that belongs to the session,
    # not the query.
    try:
        import pandas as _pd
        from pyspark.sql.functions import col, pandas_udf

        @pandas_udf("long")
        def _warm(x: _pd.Series) -> _pd.Series:
            return x

        spark.range(int(cpus) * 4).repartition(int(cpus)).select(
            _warm(col("id"))).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    total = 0.0
    for name, fn in queries.items():
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            except Exception as e:  # a failing query must not hide the rest
                runs.append(time.perf_counter() - t0)
                print(f"# bench error {name}: {e}", file=sys.stderr)
                break
        med = statistics.median(runs)
        samples[name] = [round(r, 3) for r in runs]
        timings[name] = round(med, 3)
        total += med
        print(f"# {name}: {timings[name]}s {samples[name]}", file=sys.stderr)

    print(
        json.dumps(
            {
                # detail first, headline LAST — see module docstring
                "samples": samples,
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "metric": "fleet_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
