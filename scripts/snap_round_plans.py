"""Snapshot the PER-ROUND physical plan of the iterative graph ops —
the final query plan cannot show it (each round materializes behind a
localCheckpoint), so this drives one round by hand and explains the
round's plan: the e ⋈ state join + the vote/contribution aggregation.

Runs against EITHER the r10 tree (pinned checkpoints — imports
_lc_pinned) or a pre-r10 baseline clone (plain checkpoints), so the
same script produces comparable before/after snapshots.

Usage: python scripts/snap_round_plans.py <out_prefix>
Writes <out_prefix>_lpa_round.txt and <out_prefix>_nf_round.txt using
$SPARK_GRAFT_SF_DIR (default sf0.1).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hail_spark import get_spark  # noqa: E402


def explain(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    prefix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("snap_round_plans")
    try:
        from hail_spark.operators.graph import _lc_pinned, _pin_n

        def ck_edges(df, key):
            # r10: filter/union upstream, pin on the round join key
            return _lc_pinned(
                df.repartition(_pin_n(spark), key).distinct()
            )

        def ck(df):
            return _lc_pinned(df)
    except ImportError:

        def ck_edges(df, key):
            return df.distinct().localCheckpoint()

        def ck(df):
            return df.localCheckpoint()

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 20 == 0
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + 1_000_000).alias("dst"),
    )

    # ---- label_propagation round shape (undirected) ----
    und = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    e = ck_edges(und, "src")
    nodes = ck(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("node"))
    votes = (
        e.join(labels, e["src"] == labels["node"])
        .groupBy(F.col("dst").alias("v_node"), "label")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    best = votes.groupBy("v_node").agg(
        F.min_by(
            "label", F.struct((-F.col("__n")).alias("a"), F.col("label").alias("b"))
        ).alias("new_label")
    )
    round1 = nodes.join(best, nodes["node"] == best["v_node"], "left").select(
        "node", F.coalesce(F.col("new_label"), F.col("node")).alias("label")
    )
    plan = explain(round1)
    with open(f"{prefix}_lpa_round.txt", "w") as fh:
        fh.write(plan)
    print("lpa_round Exchanges:", plan.count("Exchange"))

    # ---- neighborhood_function round shape (HLL ball merge) ----
    e2 = ck_edges(raw.select("src", "dst"), "dst")
    nodes2 = (
        e2.select(F.col("src").alias("node"))
        .unionByName(e2.select(F.col("dst").alias("node")))
        .distinct()
    )
    sk = ck(
        nodes2.groupBy("node").agg(
            F.hll_sketch_agg(F.col("node"), F.lit(14)).alias("__sk")
        )
    )
    contrib = e2.join(sk, e2["dst"] == sk["node"]).select(
        F.col("src").alias("node"), "__sk"
    )
    merged = (
        contrib.unionByName(sk.select("node", "__sk"))
        .groupBy("node")
        .agg(F.hll_union_agg("__sk").alias("__sk"))
    )
    plan2 = explain(merged)
    with open(f"{prefix}_nf_round.txt", "w") as fh:
        fh.write(plan2)
    print("nf_round Exchanges:", plan2.count("Exchange"))


if __name__ == "__main__":
    main()
