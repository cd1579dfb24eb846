"""Profile one registry query end-to-end (driver-side attribution).

Usage: python tools/profile_query.py <name> [sf_dir] [--profile] [--runs N]

Runs the named query through the same noop-sink methodology as bench.py.
With --profile, wraps the run in cProfile and prints the top call sites by
cumulative time — for multi-action gates this attributes wall time to the
specific commit/read/count sites (py4j socket waits charge to the caller).
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    runs = 1
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    do_profile = "--profile" in sys.argv

    from data_pipeline_stripe_spark.queries import REGISTRY
    from data_pipeline_stripe_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
    spark = get_session(app_name=f"profile-{name}", master=f"local[{cpus}]",
                        shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> float:
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warmup (JVM codegen)
    from pyspark.sql import functions as F  # noqa: F401
    spark.range(1000).groupBy((F.col("id") % 10).alias("g")).count() \
        .write.format("noop").mode("overwrite").save()

    for i in range(runs):
        if do_profile and i == runs - 1:
            prof = cProfile.Profile()
            prof.enable()
            dt = run()
            prof.disable()
            print(f"{name} run{i}: {dt:.3f}s")
            st = pstats.Stats(prof)
            st.sort_stats("cumulative")
            st.print_stats(45)
        else:
            print(f"{name} run{i}: {run():.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
