"""Per-query optimization probe (r13): time individual registry queries
with the bench methodology (noop sink, clearCache between samples,
median of N) and optionally dump .explain("formatted") to a file.

Usage:
  python scripts/opt_probe.py [--runs N] [--plan-dir plans/r13] \
      [--plan-suffix before|after] query [query ...]

Prints one line per query: name, median, and all samples. This is the
measurement loop of guide §1 — same session conf as bench.py so numbers
are comparable, but scoped to the queries under the knife.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dataengineering_spark.session import get_spark
    from dataengineering_spark.plans.queries import QUERIES

    spark = get_spark(
        "opt-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.queries:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"{name}: NOT FOUND")
            continue
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            spark.catalog.clearCache()
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(
                args.plan_dir, f"{name}_{args.plan_suffix}.txt"
            )
            with open(path, "w") as fh:
                fh.write(plan)
        samples = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = round(statistics.median(samples), 3)
        print(f"{name}: median={med} samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
