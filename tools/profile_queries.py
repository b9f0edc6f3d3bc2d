#!/usr/bin/env python
"""r14 optimization tooling: dump ``explain("formatted")`` plans and/or
time individual contract queries with the noop sink (guide §1.4), labeled
via setJobDescription (guide §1.5).

Usage:
    python tools/profile_queries.py plans  <out_dir> [names...]
    python tools/profile_queries.py time   <runs> [names...]
    python tools/profile_queries.py split  <runs> [names...]

``plans`` writes <out_dir>/<name>.txt with the formatted physical plan
(no execution). ``time`` runs each query <runs> times against the noop
sink and prints per-run seconds (cold first — cache cleared between
queries but not between same-query runs, matching bench.py methodology).
"""
from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_pos_kafka_pyspark_airflow_spark.plans import load_registry
from simple_pos_kafka_pyspark_airflow_spark.session import get_session


def main() -> None:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    spark = get_session("spark_graft_profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    if mode == "plans":
        out_dir = sys.argv[2]
        names = sys.argv[3:] or sorted(registry)
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            try:
                df = registry[name].build(spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
                print(f"ok   {name}", file=sys.stderr)
            except Exception as exc:  # plan-time failure is itself a finding
                print(f"FAIL {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            finally:
                spark.catalog.clearCache()
    elif mode == "time":
        runs = int(sys.argv[2])
        names = sys.argv[3:]
        for name in names:
            sams = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t0 = time.perf_counter()
                df = registry[name].build(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                sams.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            print(f"{name}: min={min(sams):.3f} runs={sams}")
    elif mode == "split":
        # build() vs execute split (guide §1): how much of a query's
        # bench time is driver-side plan construction (incl. any eager
        # work build() does) vs the timed noop-sink execution.
        runs = int(sys.argv[2])
        names = sys.argv[3:]
        for name in names:
            builds, execs = [], []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t0 = time.perf_counter()
                df = registry[name].build(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                builds.append(round(t1 - t0, 3))
                execs.append(round(t2 - t1, 3))
            spark.catalog.clearCache()
            print(
                f"{name}: build_min={min(builds):.3f} exec_min={min(execs):.3f} "
                f"builds={builds} execs={execs}"
            )
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
