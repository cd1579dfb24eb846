"""Explicit StructTypes for every entity — no schema inference anywhere.

Two families:

1. **Reference-domain schemas** — the Stripe-events ETL entities, with both
   the reference's stringly-typed layout (for fidelity tests) and the typed
   canonical layout the engine uses. Reference declares events at
   top10.py:155-164 (= platform_usage.py:40-49, royalties.py:163-172);
   resources/users come from create_resource.py:28-34 / create_user.py:25-29
   (schema *inferred* there — we always declare); categories at
   top10.py:50-55; countries CSV inferred at royalties.py:66-68.

2. **Driver test-table schemas** — the TPC-H-ish synthetic tables under
   /root/testdata/sf*/ (TESTDATA.md), declared so sources never infer.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1a. Reference-domain: raw (stringly-typed, matches reference declarations)
# ---------------------------------------------------------------------------

EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("eventId", T.StringType()),
    T.StructField("eventTime", T.StringType()),     # ISO-8601 with ±hh:mm offset
    T.StructField("processTime", T.StringType()),
    T.StructField("resourceId", T.StringType()),
    T.StructField("userId", T.StringType()),
    T.StructField("countryCode", T.StringType()),
    T.StructField("duration", T.IntegerType()),
    T.StructField("itemPrice", T.StringType()),     # stringly-typed in reference
])

RESOURCES_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("categoryId", T.StringType()),
    T.StructField("providerId", T.StringType()),
    T.StructField("promotion", T.StringType()),     # "true"/"false" strings
])

CATEGORIES_SCHEMA = T.StructType([
    T.StructField("tenant", T.StringType()),
    T.StructField("id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("percent", T.StringType()),       # numeric string in reference
])

COUNTRIES_SCHEMA = T.StructType([
    T.StructField("CountryCode", T.StringType()),
    T.StructField("Code", T.StringType()),          # currency code
    T.StructField("Country", T.StringType()),
])

EXCHANGE_RATES_SCHEMA = T.StructType([              # replaces the driver-side
    T.StructField("code", T.StringType()),          # dict closure at
    T.StructField("rate", T.DoubleType()),          # royalties.py:210-214
])

USERS_SCHEMA = T.StructType([
    T.StructField("email", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("age", T.IntegerType()),
])

# ---------------------------------------------------------------------------
# 1b. Reference-domain: typed canonical layout (engine-native)
# ---------------------------------------------------------------------------

EVENTS_TYPED_SCHEMA = T.StructType([
    T.StructField("eventId", T.StringType()),
    T.StructField("eventTime", T.TimestampType()),
    T.StructField("processTime", T.TimestampType()),
    T.StructField("resourceId", T.StringType()),
    T.StructField("userId", T.StringType()),
    T.StructField("countryCode", T.StringType()),
    T.StructField("duration", T.IntegerType()),
    T.StructField("itemPrice", T.DecimalType(12, 2)),
])

# ---------------------------------------------------------------------------
# 2. Driver test tables (/root/testdata/sf*/ — TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)
