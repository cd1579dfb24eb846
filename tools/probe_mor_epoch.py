"""One-off probe: time each sub-step of snapshot_apply_cdc_mor and count
Spark jobs per step, on a fixture shaped like one replication_mor
micro-batch. Driver-side attribution for OPTIMIZATION_r14."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_stripe_spark.operators import snapshots as S
    from data_pipeline_stripe_spark.session import get_session
    from data_pipeline_stripe_spark.sources import load_table
    from data_pipeline_stripe_spark.sources.readers import empty_frame

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(app_name="probe-mor", master=f"local[{cpus}]",
                        shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    sf_dir = "/root/testdata/sf0.1"
    scratch = "/root/repo/.scratch/probe_mor"
    shutil.rmtree(scratch, ignore_errors=True)
    dst = os.path.join(scratch, "dst")

    orders = load_table(spark, sf_dir, "orders", rebalance=False).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    S.snapshot_commit(spark, dst, empty_frame(
        spark, "k long, pri string, cents long"), mode="append")

    # a CDC batch like the mor gate's: U rows + D rows, localCheckpointed
    changes = orders.filter(F.col("k") <= 600).select(
        "k", "pri", "cents", F.lit(1).alias("seq"),
        F.when(F.col("k") % 7 == 0, F.lit("D")).otherwise(F.lit("U"))
        .alias("op")).localCheckpoint(eager=True)

    def jobs() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    # warm
    spark.range(10).count()

    for i in range(3):
        j0, t0 = jobs(), time.time()
        v, info = S.snapshot_apply_cdc_mor(spark, dst, changes, "k",
                                           epoch_key=str(i))
        print(f"apply_cdc_mor run{i}: {time.time()-t0:.3f}s "
              f"jobs={jobs()-j0} info={info}")

    # step-level timing of the same shape
    from pyspark.sql.window import Window as W
    w = W.partitionBy("k").orderBy(F.col("seq").desc())
    last = (changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn", "seq"))
    ups = last.filter(F.col("op") == "U").drop("op")
    dels = last.filter(F.col("op") == "D").select("k")

    j0, t0 = jobs(), time.time()
    e = ups.isEmpty()
    print(f"ups.isEmpty: {time.time()-t0:.3f}s jobs={jobs()-j0} -> {e}")

    data_rel = os.path.join("data", "probe1")
    j0, t0 = jobs(), time.time()
    ups.write.mode("error").parquet(os.path.join(dst, data_rel))
    print(f"ups.write: {time.time()-t0:.3f}s jobs={jobs()-j0}")

    j0, t0 = jobs(), time.time()
    entries = S._file_entries(dst, data_rel)
    print(f"_file_entries({len(entries)} files): {time.time()-t0:.3f}s "
          f"jobs={jobs()-j0}")

    written = spark.read.parquet(os.path.join(dst, data_rel))
    rel = os.path.join("eqdel", "probe1")
    j0, t0 = jobs(), time.time()
    written.select("k").dropDuplicates().coalesce(1) \
        .write.mode("error").parquet(os.path.join(dst, rel))
    print(f"sidecar.write: {time.time()-t0:.3f}s jobs={jobs()-j0}")

    keyed = spark.read.parquet(os.path.join(dst, rel))
    j0, t0 = jobs(), time.time()
    bad = keyed.filter(F.col("k").isNull()).limit(1)
    e = bad.isEmpty()
    print(f"null.isEmpty: {time.time()-t0:.3f}s jobs={jobs()-j0}")

    j0, t0 = jobs(), time.time()
    n, bands = S._key_sidecar_stats(keyed, ["k"])
    print(f"_key_sidecar_stats: {time.time()-t0:.3f}s jobs={jobs()-j0}")

    j0, t0 = jobs(), time.time()
    dels_rel = os.path.join("eqdel", "probe2")
    dels.dropDuplicates().coalesce(1).write.mode("error").parquet(
        os.path.join(dst, dels_rel))
    print(f"dels sidecar.write: {time.time()-t0:.3f}s jobs={jobs()-j0}")

    spark.stop()


if __name__ == "__main__":
    main()
