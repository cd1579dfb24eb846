import sys
import time

sys.path.insert(0, ".")

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


ROWS = [("AFRICA", 1.10), ("AMERICA", 1.00), ("ASIA", 0.90), ("EUROPE", 1.20)]

py_rates = spark.createDataFrame(ROWS, "region_name string, rate double")
t("py_rates_noop", lambda: noop(py_rates))
t("py_rates_noop2", lambda: noop(py_rates))

sql_rates = spark.sql(
    "SELECT * FROM VALUES " +
    ", ".join(f"('{n}', CAST({r} AS DOUBLE))" for n, r in ROWS) +
    " AS t(region_name, rate)")
t("sql_rates_noop", lambda: noop(sql_rates))

li = load_table(spark, d, "lineitem")
reg = F.broadcast(load_table(spark, d, "region"))
j1 = li.join(reg, li.l_suppkey % 4 == reg.r_regionkey).join(
    F.broadcast(py_rates), F.col("r_name") == F.col("region_name"))
j2 = li.join(reg, li.l_suppkey % 4 == reg.r_regionkey).join(
    F.broadcast(sql_rates), F.col("r_name") == F.col("region_name"))
t("join_with_py_rates", lambda: noop(j1))
t("join_with_py_rates2", lambda: noop(j1))
t("join_with_sql_rates", lambda: noop(j2))
t("join_with_sql_rates2", lambda: noop(j2))
