"""Generate PLANS.md: formatted physical plans of the flagship queries
with the scale property each one demonstrates — the .explain() evidence
trail behind tests/test_plans.py."""

import sys

sys.path.insert(0, ".")

from data_pipeline_stripe_spark.queries import REGISTRY
from data_pipeline_stripe_spark.session import get_session

SHOWCASE = [
    ("q1_pricing_summary",
     "Filter + 7-column projection pushed into the parquet scan "
     "(PushedFilters / ReadSchema); 8 aggregates in one partial+final "
     "hash aggregation — one shuffle."),
    ("star_join_revenue_by_region",
     "Three BroadcastHashJoins — the fact table never shuffles for the "
     "joins, only for the final 5-row aggregate."),
    ("top10_event_types_daily",
     "The reference's count + self-join + dedup collapses to one "
     "aggregation + one window — no Join operator in the plan at all."),
    ("platform_usage_monthly",
     "Six agg+self-join rounds in the reference → one grouped agg, one "
     "window over the tiny aggregate."),
    ("royalties_monthly_usd",
     "The supplier-nation-region-rates snowflake is pre-flattened into "
     "ONE tiny broadcast dim keyed on s_suppkey (round 8: four per-row "
     "hash probes, one on a string key, became one integer probe — the "
     "probes outcost the fact-fact join at x100), the rates dim a "
     "pure-JVM VALUES LocalRelation; no Python boundary anywhere — the "
     "reference pickled every row through convert_to_usd."),
    ("global_topk_orders",
     "TakeOrderedAndProject: per-partition top-K then a K-row merge — "
     "no global sort."),
    ("doc_minhash_lsh_pairs",
     "Signatures = 16 aggregate columns over one shingle explode (no "
     "row blow-up); banded self-join keyed on band_key — candidate "
     "generation is a hash join, never O(n^2)."),
    ("embedding_topk_cosine",
     "8 query vectors broadcast against the corpus; similarity is "
     "JVM-side zip_with/aggregate expression work inside codegen."),
    ("asof_last_order_before_event",
     "As-of join as tagged-union + one window pass — single shuffle of "
     "events+orders, no per-key cross product."),
    ("range_join_cooccurring_events",
     "Range join bucketized to an equi-join on the time bucket — keyed "
     "shuffle instead of the nested-loop Spark plans for raw "
     "inequalities."),
    ("embedding_cosine_near_dup_bucketed",
     "IVF-bucketed near-dup: the only nested loops are the corpus × "
     "4-row broadcast centroid probes; candidate generation is a keyed "
     "join on cluster_id — the O(n^2) pair scan is gone from the scale "
     "path."),
    ("doc_ngram_jaccard_pairs",
     "Inverted-index self-join on shingle with a document-frequency cap "
     "subquery — a corpus-common shingle can no longer produce a "
     "quadratic hot key."),
    ("q9_product_line_profit",
     "Deep multi-join: the p_name LIKE filter prunes the part broadcast "
     "BEFORE the fact join; supplier⨝nation pre-joined into one "
     "broadcast — lineitem never shuffles for a join."),
    ("q18_large_volume_customers",
     "Agg-then-join: lineitem reduces to >250-qty orders (~1%) before "
     "any join; final top-100 is TakeOrderedAndProject, not a sort."),
    ("q19_disjunctive_revenue",
     "3-branch disjunction: Catalyst extracts the common conjuncts "
     "(brand set, size/qty bounds) into PushedFilters on both scans; "
     "the full predicate evaluates post-join inside codegen."),
    ("doc_chunks",
     "Overlapping context-window chunking: split → sequence → "
     "posexplode → slice — no shuffle of its own (the one Exchange is "
     "load_table's single-row-group fixture rebalance, test-env only); "
     "chunking runs at scan speed."),
    ("doc_simhash_near_dup",
     "32-bit shingle-SimHash pairs: the self-join is keyed on the "
     "16-bit half blocks (hash join), Hamming evaluated only on "
     "bucket-mates."),
    ("q2_min_cost_supplier",
     "Partsupp-derived min-cost supplier: one fact groupBy builds the "
     "supply edges; the correlated-MIN subquery is a per-part window "
     "over the post-filter agg output, never a second fact pass."),
    ("embedding_rp_lsh_pairs",
     "Random-hyperplane LSH: the 32-plane sign-bit signature is pure "
     "per-row expression math (plane matrix constant-folded into "
     "codegen); candidates come from a hash self-join on 4-bit band "
     "keys — no nested loop, no centroid table."),
    ("doc_decontaminate",
     "Train/eval 8-gram overlap: eval grams broadcast, train side is "
     "one explode + broadcast hash probe + one groupBy — no fact-fact "
     "shuffle at any corpus size."),
    ("doc_shared_passages",
     "Winnowing passage dedup: gram hashing + window-min selection are "
     "array expressions at scan speed; the pair join is the capped "
     "inverted-index self-join keyed on fingerprint — same scale shape "
     "as the shingle-Jaccard pairs at ~2/(w+1) the index density."),
    ("doc_decontaminate_bloom",
     "Bloom-prefiltered decontamination: the eval gram set folds into "
     "one map row (<= m/64 entries) broadcast over the train stream; "
     "membership is a scan-side forall inside codegen, and only Bloom "
     "survivors reach the exact verify semi-join — the plan for when "
     "the eval grams outgrow a string broadcast."),
    ("corr_qty_price_by_flag",
     "Correlation from exact decimal(38,0) moment sums in ONE "
     "map-side-combinable aggregation — no second pass, no "
     "order-dependent float accumulation; the closed form evaluates "
     "on the 3-row aggregate output."),
    ("pivot_status_revenue_by_priority",
     "Pivot with pinned values: one grouped aggregation of conditional "
     "sums — no distinct-values pre-job, stable output schema."),
    ("doc_bpe_merge_step",
     "Distributed BPE merge step: the sequential left-to-right fold "
     "reformulated as window expressions (run-parity rule), so one "
     "vocab-induction step is two shuffles at any corpus size; the "
     "1-row top pair is a broadcast cross."),
    ("doc_incremental_dedup",
     "Incremental near-dup: the band join probes ONLY the new batch's "
     "band rows against the corpus index — old-vs-old pairs never "
     "exist in the plan; daily ingest cost is O(new x bucket-mates)."),
    ("merge_upsert_customers",
     "MERGE upsert: one keyed full-outer join computes exact "
     "update/insert/keep semantics with an audit column — no window, "
     "no second pass; AQE free to broadcast the small batch."),
    ("embedding_pq_topk",
     "Product quantization + ADC: codes from a broadcast-codebook "
     "min-struct agg; each query's distance LUT folds into ONE map row "
     "riding a broadcast cross — scoring is 4 map lookups + an integer "
     "add per corpus vector, never a float dot product."),
    ("scd2_customer_priority_history",
     "SCD2 history in ONE exchange: consecutive-duplicate collapse and "
     "the validity lead share the same (custkey -> orderdate, orderkey) "
     "window partitioning."),
    ("funnel_signup_click_purchase",
     "Ordered funnel: three user-keyed grouped aggs — after the first "
     "shuffle the step joins are co-partitioned; the events fact is "
     "scanned per step with the event_type filter pushed down, never "
     "materialized per-user."),
    ("scd2_pit_lineitem_priority",
     "Point-in-time join as union-window as-of: the fact-fact "
     "lineitem-orders join is the one inherent sort-merge; the SCD2 "
     "version lookup costs ONE more exchange (facts+versions on "
     "custkey) — no interval-join fan-out operator anywhere."),
    ("triangle_count_copurchase",
     "Degree-ordered triangle counting: every wedge/closure join is a "
     "keyed hash join (SortMergeJoin/BroadcastHashJoin); the only "
     "nested-loop is the final 1-row summary cross."),
    ("zorder_key_orders",
     "The Z-order key is pure projection arithmetic at scan speed — "
     "no Join, no shuffle beyond the test-fixture round-robin "
     "rebalance: one Project over the FileScan."),
    ("gapfill_user_daily_values",
     "Gap-fill: 1-row bounds broadcast (scalar-subquery class), "
     "bounded per-user day explode, left join and forward-fill window "
     "sharing one user_id partitioning."),
    ("winsorized_value_stats",
     "Winsorize: the per-type percentile aggregate is broadcast back "
     "onto the events scan (BroadcastHashJoin) — the clip runs inside "
     "codegen; no full shuffle of the fact on the 5-key type column "
     "(which would be skew-prone)."),
    ("embedding_ivf_topk_pruned",
     "Pruned IVF: query→centroid routing is a KEYED hash join on the "
     "RP band keys (both sides compute the 32-plane signature at scan "
     "speed); the only nested-loop left is the 16-row corpus→centroid "
     "build assignment — the query×centroid cross of plain ivf_topk "
     "is gone."),
    ("approx_distinct_users_per_type",
     "Deterministic md5 HLL: two map-side-combinable aggregations "
     "(register max over <=1024 buckets/key, then the fixed-point "
     "integer harmonic fold) — no joins, no Python, estimate "
     "reproducible on any engine."),
    ("events_heavy_hitter_value_buckets",
     "Count-min heavy hitters: sketch build and probe are keyed "
     "aggregations/joins over a 4x256-row counter table; the exact "
     "verify re-counts ONLY sketch candidates via a semi join; the "
     "single nested-loop is the 1-row total (scalar-subquery class)."),
    ("cdc_snapshot_diff_orders",
     "Snapshot diff: one keyed full-outer join + NULL-safe struct "
     "comparison classifies I/U/D; duplicate and NULL keys raise "
     "lazily inside the same projection — no second pass, output "
     "proportional to churn."),
    ("events_weighted_sample_pps",
     "Systematic PPS sampling: per-stratum cumulative-weight windows "
     "(one exchange) + integer grid selection in codegen — "
     "deterministic, no rand(), no Python."),
    ("mad_outlier_value_stats",
     "Robust MAD stats from ONE raw scan, zero joins: the deviation "
     "histogram is derived FROM the value histogram via partition "
     "windows (a join-back form re-planned the events scan 7 times)."),
    ("pareto_front_orders_price_recency",
     "Skyline as one hash exchange + a RANGE-framed running-max window "
     "— no NOT-EXISTS self-join, dominance keyed on the cent value so "
     "any physical row order gives the identical frontier."),
    ("peak_concurrent_sessions_daily",
     "Sweep-line concurrency: sessionization planned exactly once "
     "(both interval endpoints exploded in one pass), deltas collapsed "
     "per second, one running-sum window over the tiny point set."),
    ("ema_daily_value_halflife",
     "Dyadic-exact EMA: the 20-lag decayed self-join broadcasts the "
     "per-(type, day) pre-aggregate — raw events shuffle once for the "
     "daily rollup and never join."),
    ("value_ks_distance_by_type",
     "Exact two-sample KS: two histogram passes, a keys×grid merge, "
     "one ordered window — integer cross-multiplied ECDF comparison, "
     "no float accumulation anywhere."),
    ("royalties_monthly_usd_bucketed",
     "The measured worst scaler's fix, round-8 form: both facts written "
     "one-file-per-bucket on the order key with amount/month "
     "materialized, so the SortMergeJoin consumes the bucketed "
     "distribution AND its sortBy order directly — no Exchange and no "
     "Sort on either orderkey side; the only shuffle left is the "
     "(month, provider) aggregate. x100 ratio 8.6x -> 2.28x."),
    ("variant_nested_extract",
     "Spark-4 Variant path: parse_json once per row into the binary "
     "variant encoding, then typed variant_get path extractions — "
     "measured at sf0.1: 4 extractions cost 12% more than 1 (the parse "
     "is shared), and the variant path is 2.5x faster than "
     "get_json_object re-parsing the same 4 fields (0.99s vs 2.52s). "
     "No Python boundary; one shuffle for the per-type aggregate."),
    ("corrupt_json_quarantine",
     "Dead-letter scan: PERMISSIVE JSON read with the corrupt-record "
     "column — quarantine split is a coalesce inside the same scan "
     "stage, one grouped aggregate after; malformed lines cost no "
     "second pass."),
    ("doc_mixture_resample",
     "Deterministic mixture resampling: Hamilton quotas computed on the "
     "#sources-row frame reach the corpus as a BroadcastHashJoin build "
     "side; the md5-rank selection is a two-pass window (per-partition "
     "top-quota prefilter on SPARK_PARTITION_ID, then the global "
     "per-source rank over survivors) — a skewed source never sorts "
     "its whole extent on one reducer."),
    ("feature_snapshot_user_weekly",
     "Point-in-time feature matrix: the fact pre-aggregates to "
     "(user, type, day) BEFORE the 4-row cutoff dim joins in on the "
     "range condition (BroadcastNestedLoopJoin over the aggregate, "
     "never the raw scan) — leakage-free by construction, one fact "
     "shuffle regardless of cutoff count."),
    ("multitouch_attribution_credit",
     "Exact-sum attribution: position + count are expressions over one "
     "purchase-keyed window pass on the pair join's output; the "
     "Hamilton allocator's windows ride the SAME key, so credits that "
     "reconcile to exactly 1M ppm per purchase cost no extra "
     "shuffle."),
]


def main() -> None:
    spark = get_session(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"
    out = ["# Physical plans of the flagship queries (sf0.01, local[8])",
           "",
           "Generated by tools/dump_plans.py; the properties called out here",
           "are pinned as assertions in tests/test_plans.py.", ""]
    # At sf0.01 orders fits under the auto-broadcast threshold, which
    # would hide the co-located SortMergeJoin the bucketed-royalties
    # showcase exists to exhibit (at warehouse scale orders is a fact
    # and never broadcasts). Disable auto-broadcast for that dump, as
    # tests/test_plans.py does — the hinted dims still broadcast.
    NO_AUTO_BROADCAST = {"royalties_monthly_usd_bucketed"}
    default_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for name, why in SHOWCASE:
        if name in NO_AUTO_BROADCAST:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           default_thresh)
        out += [f"## {name}", "", why, "", "```", plan.rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
