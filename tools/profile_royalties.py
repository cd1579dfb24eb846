import sys
import time

sys.path.insert(0, ".")

from data_pipeline_stripe_spark.session import get_session
from data_pipeline_stripe_spark.queries import REGISTRY

spark = get_session(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
d = "/root/testdata/sf0.1"

noop = lambda df: df.write.format("noop").mode("overwrite").save()

for name in ["royalties_monthly_usd", "doc_exact_dedup", "top10_event_types_daily",
             "q1_pricing_summary"]:
    for i in range(3):
        t0 = time.time()
        noop(REGISTRY[name].fn(spark, d))
        print(name, i, round(time.time() - t0, 2), flush=True)

REGISTRY["royalties_monthly_usd"].fn(spark, d).explain(mode="formatted")
