import os
import sys
import time

sys.path.insert(0, ".")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "48g"

from data_pipeline_stripe_spark.session import get_session
from data_pipeline_stripe_spark.sources import load_table
from pyspark.sql import functions as F

spark = get_session(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
d = "/root/testdata/sf0.1"

noop = lambda df: df.write.format("noop").mode("overwrite").save()


def t(label, thunk):
    t0 = time.time()
    thunk()
    print(label, round(time.time() - t0, 2), flush=True)


li = load_table(spark, d, "lineitem")
orders = load_table(spark, d, "orders")
sup = F.broadcast(load_table(spark, d, "supplier"))
nat = F.broadcast(load_table(spark, d, "nation"))
reg = F.broadcast(load_table(spark, d, "region"))

t("li_count", lambda: li.count())
t("li_orders_join", lambda: noop(li.join(orders, li.l_orderkey == orders.o_orderkey)))
t("li_orders_join2", lambda: noop(li.join(orders, li.l_orderkey == orders.o_orderkey)))
j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(sup, li.l_suppkey == sup.s_suppkey).join(nat, sup.s_nationkey == nat.n_nationkey).join(reg, nat.n_regionkey == reg.r_regionkey)
t("all_joins", lambda: noop(j))
t("all_joins2", lambda: noop(j))
from data_pipeline_stripe_spark.queries import REGISTRY
t("royalties_full", lambda: noop(REGISTRY["royalties_monthly_usd"].fn(spark, d)))
t("royalties_full2", lambda: noop(REGISTRY["royalties_monthly_usd"].fn(spark, d)))
