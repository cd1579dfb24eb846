import sys
import time

sys.path.insert(0, ".")

from data_pipeline_stripe_spark.session import get_session
from data_pipeline_stripe_spark.sources import load_table
from data_pipeline_stripe_spark.llm import dedup

spark = get_session(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
d = "/root/testdata/sf0.1"
docs = load_table(spark, d, "documents")


def t(label, thunk):
    t0 = time.time()
    thunk()
    print(label, round(time.time() - t0, 2), flush=True)


noop = lambda df: df.write.format("noop").mode("overwrite").save()
t("count_docs", lambda: docs.count())
t("exact_dedup", lambda: noop(dedup.exact_dedup_groups(docs)))
t("exact_dedup_2nd", lambda: noop(dedup.exact_dedup_groups(docs)))
t("shingles", lambda: noop(dedup._distinct_shingles(docs, "doc_id", "text")))
t("signatures", lambda: noop(dedup.minhash_signatures(docs)))
t("lsh_pairs", lambda: noop(dedup.minhash_lsh_pairs(docs)))
t("jaccard", lambda: noop(dedup.ngram_jaccard_pairs(docs)))
