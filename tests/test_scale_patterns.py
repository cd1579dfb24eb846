"""Scale-pattern tests: bucketed co-located joins, salted skew joins,
two-phase aggregation — correctness plus the plan property each exists for."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_stripe_spark.operators import salted_join, two_phase_agg
from data_pipeline_stripe_spark.sources import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # skew: pretend one orderkey is hot by joining on a low-cardinality col
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(orders, "l_orderkey").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    salted = salted_join(li, orders, on="l_orderkey", n_salts=8).agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_two_phase_agg_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {r.l_returnflag: round(r.s, 2) for r in
              li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()}
    salted = {r.l_returnflag: round(r.l_quantity_sum, 2) for r in
              two_phase_agg(li, "l_returnflag", "l_quantity", "sum").collect()}
    assert direct == salted


def test_bucketed_join_needs_no_shuffle(spark, sf_dir):
    """bucketBy co-location: two tables bucketed on the join key join
    without any Exchange — the 100 TB answer to repeated big-big joins
    (guide: Partitioning & shuffle). Uses the default ./spark-warehouse
    (warehouse.dir is a static conf); tables are dropped after."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite") \
        .saveAsTable("li_bucketed")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite") \
        .saveAsTable("orders_bucketed")
    lb = spark.table("li_bucketed")
    ob = spark.table("orders_bucketed")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Writing day-partitioned parquet and filtering on the partition
    column must prune at planning time: the scan's PartitionFilters
    carries the predicate and only the matching partition's rows are
    read — the data-skipping pattern every 100 TB event store relies
    on."""
    from pyspark.sql import functions as F
    from data_pipeline_stripe_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(out)
    days = [r.day for r in ev.select("day").distinct().collect()]
    target = sorted(days)[0]
    back = spark.read.parquet(out).filter(F.col("day") == target)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and target not in plan.split(
        "PushedFilters"
    )[-1]
    assert f"(day = {target})" in plan or "isnotnull(day" in plan
    expect = ev.filter(F.col("day") == target).count()
    assert back.count() == expect > 0


def test_merge_schema_evolution_read(spark, tmp_path):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema reads the union schema with nulls for the old
    batch — the accreting-fields reality of any long-lived corpus."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(d + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(d + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_parquet_aggregate_pushdown_footer_stats(spark, sf_dir):
    """COUNT/MIN/MAX with no filter can be answered from parquet footer
    statistics — with the v2 source and aggregatePushDown the scan shows
    PushedAggregation and reads no row data. 100 TB corpus-card queries
    (row counts, min/max bounds) become metadata reads."""
    from pyspark.sql import functions as F

    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushDown", "true")
        df = spark.read.parquet(f"{sf_dir}/orders.parquet")
        agg = df.agg(F.count("*").alias("n"),
                     F.max("o_totalprice").alias("mx"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [COUNT(*)" in plan \
            or "PushedAggregation" in plan
        row = agg.collect()[0]
        # cross-check against the plain v1 scan
        spark.conf.set("spark.sql.sources.useV1SourceList", "parquet")
        plain = spark.read.parquet(f"{sf_dir}/orders.parquet").agg(
            F.count("*").alias("n"), F.max("o_totalprice").alias("mx")
        ).collect()[0]
        assert (row.n, row.mx) == (plain.n, plain.mx)
    finally:
        if old_v1 is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushDown", "false")
