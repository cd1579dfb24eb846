import sys
import time

sys.path.insert(0, ".")

from data_pipeline_stripe_spark.session import get_session
from data_pipeline_stripe_spark.sources import load_table
from data_pipeline_stripe_spark.sources.readers import inline_dim
from pyspark.sql import functions as F

spark = get_session(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
d = "/root/testdata/sf0.1"
noop = lambda df: df.write.format("noop").mode("overwrite").save()


def t(label, thunk):
    t0 = time.time()
    thunk()
    print(label, round(time.time() - t0, 2), flush=True)


def royalties(join_hint):
    li = load_table(spark, d, "lineitem")
    orders = load_table(spark, d, "orders")
    if join_hint:
        orders = orders.hint(join_hint)
    sup = F.broadcast(load_table(spark, d, "supplier"))
    nat = F.broadcast(load_table(spark, d, "nation"))
    reg = F.broadcast(load_table(spark, d, "region"))
    rates = F.broadcast(inline_dim(
        spark, [("AFRICA", 1.10), ("AMERICA", 1.00), ("ASIA", 0.90), ("EUROPE", 1.20)],
        "region_name string, rate double"))
    amount = (F.when(F.col("l_returnflag") == "R", F.lit(0.0))
              .otherwise(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax")))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(sup, li.l_suppkey == sup.s_suppkey)
            .join(nat, sup.s_nationkey == nat.n_nationkey)
            .join(reg, nat.n_regionkey == reg.r_regionkey)
            .join(rates, reg.r_name == rates.region_name)
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                     F.col("n_name").alias("provider"))
            .agg(F.round(F.sum(amount * F.col("rate")), 2).alias("royalty_usd")))


for hint in [None, "merge", "shuffle_hash", None, "merge", "shuffle_hash"]:
    t(f"royalties[{hint}]", lambda h=hint: noop(royalties(h)))
