"""Extra benchmarks (guide §1.4 noop-sink isolation) — NOT the driver
contract.  bench.py is frozen for measurement; this harness exists so
optimization work can time individual queries, capture plans, and probe
intermediate cardinalities without touching the frozen protocol.

Usage:
  python bench_extra.py q1 q2 ...      # time the named queries (noop sink)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py --plans q1
  python bench_extra.py --all          # every HEADLINE query once

Env: SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's measurement scale),
SPARK_GRAFT_CPUS, BENCH_EXTRA_RUNS (timed runs per query, default 1),
BENCH_EXTRA_PLAN_DIR (where --plans writes explain output).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "1"))
PLAN_DIR = os.environ.get("BENCH_EXTRA_PLAN_DIR", "plans/r06")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}

    from annual_report_pdf_parsers_spark.queries import QUERIES
    from annual_report_pdf_parsers_spark.session import get_spark, stop_all

    names = args
    if "--all" in flags:
        from bench import HEADLINE

        names = list(HEADLINE)

    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS
    )
    out: dict[str, float] = {}
    try:
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(10).count()
        for name in names:
            times = []
            for _ in range(RUNS):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"extra:{name}")
                # build INSIDE the timed region — bench.py times
                # QUERIES[name](...) too, and localCheckpoint-based
                # queries do real work at build time
                t0 = time.time()
                df = QUERIES[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            if "--plans" in flags:
                os.makedirs(PLAN_DIR, exist_ok=True)
                with open(
                    os.path.join(PLAN_DIR, f"{name}.txt"), "w"
                ) as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
            out[name] = min(times)
            print(f"{name}: {min(times)} {times}", file=sys.stderr)
    finally:
        stop_all()
    print(json.dumps({"sf": SF_DIR, "queries": out}))


if __name__ == "__main__":
    main()
