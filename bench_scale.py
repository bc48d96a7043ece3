"""Scale bench: the shuffle-heavy subset of the suite at ~sf1.

The driver's gate runs bench.py at sf0.1; at that scale most shuffles
fit in one or two partitions per core, so plans that would fall over at
cluster scale still look fine. This harness synthesizes a ~10× dataset
(union of /root/testdata/sf0.1 with shifted keys — same distributions,
10× rows; cached under /tmp) and times the queries whose cost is
dominated by wide exchanges, so a regression in partitioning/broadcast
decisions shows up between rounds.

Usage: python bench_scale.py  → one JSON line
{"metric": "hail_spark_scale_suite", "value": <total sec>, ...}
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entry

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sparkgraft_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))

# key columns shifted per copy so the scaled data keeps realistic key
# cardinality instead of COPIES× duplicates of every key
_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# shuffle/exchange-dominated queries; the rest of the suite is scan- or
# map-bound and already representative at sf0.1
QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "group_counter", "distinct_by_key", "scan_cumulative_sum",
    # scan_battery is excluded: its prefix-collect component is O(n^2)
    # in OUTPUT by definition, so its scale-up curve measures semantics,
    # not the plan (scan_cumulative_sum/add_index cover the scan path)
    "add_index", "minhash_lsh_dedup",
    "ngram_jaccard_dedup", "embedding_near_dup", "dedup_exact",
    # iterative CC (per-round shuffles) and the global-sort packing path
    "dedup_clusters", "pack_sequences", "deterministic_shuffle",
    "mt_row_agg", "mt_group_rows_by", "mt_group_cols_by",
    "vds_densify", "take_by_per_key", "collect_per_key",
    # map-only gemm accumulators (linreg/IBD) and the window-rank
    # downsample grid: shuffle-light by design, included to catch any
    # regression that reintroduces a wide exchange
    "linreg_rows", "ibd_pairs", "downsample_cells",
    # round-4 additions: broadcast-Lloyd kmeans + bounded intra-cluster
    # self-join, and the gram posting-list df join
    "semantic_dedup_kmeans", "duplicated_gram_stats",
    # corpus line dedup (3 hash shuffles incl. document reassembly) and
    # the PQ/IVFPQ ADC scans (map-only encode + bounded top-k window)
    "line_dedup_docs", "pq_ann_topk", "ivfpq_ann_topk",
    # span-removal rebuild (posting-list + coverage anti-join), the
    # incremental band-index probe, and the chunk explode
    "span_removal_exactsubstr", "incremental_dedup_batch",
    "chunk_documents_windows",
    # round-5 additions: the as-of union-merge (one key shuffle + per-key
    # sort), gap sessionization (windows + partition-reusing groupBy),
    # Misra-Gries heavy hitters (candidate screen vs the token long
    # tail), and the bloom decontamination screen+verify
    "asof_join_events", "sessionize_events", "frequent_tokens_exact",
    "bloom_decontam_flagged",
    # bucketed write+join (the write IS the cost being amortized), the
    # CDC full-outer merge, and the salted-skew join
    "bucketed_join_agg", "merge_upsert_snapshot", "salted_join_skewed",
    # r05 verdict item 9: k-stage conditional-min funnel and the
    # cohort distinct-count — both hash-agg chains on the user key
    "funnel_conversion", "cohort_retention_triangle",
    # round-6 additions: the 6-way dual-nation-chain join (q7), the
    # part+supplier+orders profit join (q9), and the per-user analytic
    # window battery (one key shuffle, ten frames)
    "q7_volume_shipping", "q9_product_profit", "window_functions_battery",
    # round-6 late wave: DSIR selection (explode + bucket model + score
    # join), KMV bottom-k distinct sketch, T5 span corruption (per-doc
    # windows), horizon-banded attribution join, 2-round LPA (iterative
    # label shuffles), degree-oriented triangle enumeration, and the
    # corpus-fit bigram LM scoring joins
    "dsir_importance_select", "kmv_theta_sketch", "span_corruption_pairs",
    "attribution_first_last", "label_propagation_communities",
    "triangle_count_suppliers", "bigram_logprob_docs",
    # round-8 additions: the multimodal dedup triple (Arrow decode +
    # banded/posting-list joins over per-doc fixtures) and the unigram
    # Viterbi encode projection
    "image_near_dup_assets", "audio_near_dup_assets",
    "video_near_dup_assets", "unigram_encode_docs",
    # round-8 iterative/graph/posting-join additions
    "sssp_purchase_graph", "kcore_purchase_graph", "doc_cosine_topk",
    "basket_rules_parts", "stream_stream_join_replay",
    # round-9 additions: the community-quality joins, the wedge +
    # anti-join link predictor, the shingle containment posting join,
    # and the 3-window SCD2 build. (harmonic_centrality_graph /
    # neighborhood_fn_graph are excluded: their exact-replay oracles
    # GUARD on the HLL sparse regime and correctly raise at sf1+ ball
    # sizes — the operator's scale rows live in SCALE.md instead.
    # edit_distance_near_dup and containment_near_supersets are
    # excluded for the dedup-family SEMANTICS reason: the scaled
    # corpus is 10 shifted COPIES of every text, so each doc gains 9
    # exact clones and the true near-dup pair set grows ~100x — the
    # gate queries then measure output volume, not the plan (measured
    # 156 s / 111 s at sf1 vs 4.7 s / 1.9 s at sf0.1; same class as
    # the dedup_clusters/minhash notes in SCALE.md).)
    "modularity_communities", "adamic_adar_links",
    "scd2_user_history",
]


def materialize(spark: SparkSession) -> None:
    os.makedirs(DST, exist_ok=True)
    for t in _TABLES:
        out = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(out):
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        if t in ("region", "nation"):
            df.write.mode("overwrite").parquet(out)
            continue
        shift_cols = _SHIFT.get(t, [])
        maxes = (
            df.agg(*[F.max(c).alias(c) for c in shift_cols]).collect()[0].asDict()
            if shift_cols
            else {}
        )
        copies = df.withColumn(
            "__copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        )
        for c in shift_cols:
            copies = copies.withColumn(
                c, F.col(c) + F.col("__copy") * F.lit(int(maxes[c]) + 1)
            )
        copies.drop("__copy").write.mode("overwrite").parquet(out)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("hail_spark_scale_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    materialize(spark)
    qs = entry.queries()
    # bench.py's median-of-N + spread protocol (round-5 verdict item 7):
    # sf1 numbers historically swing 2-8x per query under sandbox load,
    # so single-shot totals were not comparable round-over-round. Heavy
    # queries (>5 s first run) cap at TWO iterations and report the min
    # (the first run absorbs JIT/warmup; the gap stays visible in
    # `spread`), like bench.py.
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    queries = (
        [q.strip() for q in only.split(",") if q.strip()] if only else QUERIES
    )
    unknown = [q for q in queries if q not in entry.queries()]
    if unknown:
        raise SystemExit(
            f"SPARK_GRAFT_SCALE_ONLY names not in queries(): {unknown}"
        )
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    for name in queries:
        runs: list[float] = []
        for it in range(iters):
            if it > 1 and runs and runs[0] > 5.0:
                break
            t0 = time.time()
            qs[name](spark, DST).collect()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        if len(runs) == 2:
            times[name] = runs[0]
        else:
            times[name] = runs[len(runs) // 2]  # median
        spread[name] = round(runs[-1] - runs[0], 3)
        total += times[name]
        if os.environ.get("SPARK_GRAFT_BENCH_VERBOSE"):
            print(f"  {name}: {times[name]}s ±{spread[name]}", flush=True)
    line = json.dumps(
        {
            "metric": "hail_spark_scale_suite",
            "value": round(total, 2),
            "unit": "sec",
            "queries": times,
            "spread": spread,
            "iters": iters,
            "sf": 0.1 * COPIES,
        }
    )
    print(line)
    # append to the round-over-round log so regressions are diffable
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SCALE.jsonl"), "a") as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
