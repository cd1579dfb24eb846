"""data_pipeline_stripe_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference Stripe-events ETL pipeline
(josecavila/Data-Pipeline-Stripe), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
and designed for 100 TB scale: distributed file sources, broadcast
dimension joins, single-pass window aggregation, partitioned sinks, AQE.

Layout
------
- ``session``    — SparkSession builder tuned for local[N] and cluster use
- ``schemas``    — explicit StructTypes for every entity (no inference)
- ``sources``    — distributed readers (parquet/json/csv) + dim helpers
- ``operators``  — reusable relational building blocks (joins/aggs/windows)
- ``functions``  — scalar/text/hash column expression helpers
- ``pipelines``  — the three reference reports, rebuilt idiomatically
- ``llm``        — dedup / similarity / text-analysis / multimodal ops
- ``streaming``  — Structured Streaming source + windowed aggregations
- ``queries``    — the declared query registry (Spark callable + SQL oracle)
"""

__version__ = "0.1.0"
