import sys
import time

sys.path.insert(0, ".")

from data_pipeline_stripe_spark.session import get_session
from pyspark.sql import functions as F

spark = get_session(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
d = "/root/testdata/sf0.1"


def t(label, thunk):
    t0 = time.time()
    r = thunk()
    print(label, round(time.time() - t0, 2), flush=True)
    return r


df = t("read_documents", lambda: spark.read.parquet(f"{d}/documents.parquet"))
t("count", lambda: df.count())
t("sha_agg_1part", lambda: df.select(F.sha2(F.lower(F.trim("text")), 256).alias("h"), "doc_id")
  .groupBy("h").agg(F.min("doc_id"), F.count("*")).write.format("noop").mode("overwrite").save())
rep = df.repartition(32)
t("repartition_sha_agg", lambda: rep.select(F.sha2(F.lower(F.trim("text")), 256).alias("h"), "doc_id")
  .groupBy("h").agg(F.min("doc_id"), F.count("*")).write.format("noop").mode("overwrite").save())
t("repartition_sha_agg2", lambda: rep.select(F.sha2(F.lower(F.trim("text")), 256).alias("h"), "doc_id")
  .groupBy("h").agg(F.min("doc_id"), F.count("*")).write.format("noop").mode("overwrite").save())
