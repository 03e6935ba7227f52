"""Per-query profile: wall time, SPARK JOB COUNT, and the formatted
plan of the returned frame — the round-14 optimization evidence tool.

Job count matters because the sf0.001-vs-sf0.1 diagnostic showed most
of the fleet is FIXED-OVERHEAD bound at bench scale (plans, job
scheduling, codegen) — for queries that aggregate/collect internally
(bleu, sen_slope, chi2, …) the returned frame's plan is literals and
the job sequence IS the plan shape.

Usage:
    python scripts/qprof.py QUERY [QUERY ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/qprof.py bleu_docs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: qprof.py QUERY [QUERY ...]", file=sys.stderr)
        return 2
    from bench import build_spark

    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = build_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    try:
        entry_mod.entry(spark).write.format("noop") \
            .mode("overwrite").save()
    except Exception:
        pass

    out = {}
    for name in names:
        if name not in queries:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        group = f"qprof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        jobs = tracker.getJobIdsForGroup(group)
        sc.setJobGroup(None, None)
        spark.catalog.clearCache()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        out[name] = {"sec": round(t_total, 3),
                     "build_sec": round(t_build, 3),
                     "n_jobs": len(jobs)}
        print(f"# {name}: {t_total:.3f}s ({t_build:.3f}s build), "
              f"{len(jobs)} jobs", file=sys.stderr)
        tag = os.environ.get("QPROF_TAG")
        if tag:
            path = os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                "plans", os.environ.get("QPROF_DIR", "r15"),
                f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(f"-- qprof: {t_total:.3f}s wall "
                         f"({t_build:.3f}s plan build), "
                         f"{len(jobs)} spark jobs, sf_dir={sf_dir}\n")
                fh.write(plan)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
