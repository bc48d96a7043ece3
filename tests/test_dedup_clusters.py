"""Connected components (large-star/small-star) vs a plain union-find,
and the end-to-end dedup_clusters pipeline.

Reference parity: Hail has no CC operator; this is part of the LLM-data
extension surface (near-dup pairs -> keep-one-per-cluster)."""

import pytest
from pyspark.sql import functions as F

from hail_spark.llmdata import dedup
from tests.conftest import load


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # re-root to the component min
    comp = {}
    for n in list(parent):
        r = find(n)
        comp[n] = min(comp.get(r, r), r)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # two chains + a triangle + an isolated pair
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21), (21, 22), (20, 22), (30, 31)],
        # star with high-degree hub, reversed ids
        [(100, i) for i in range(90, 100)] + [(5, 100)],
        # long path (stresses the O(log n) rounds)
        [(i, i + 1) for i in range(0, 40)],
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df).collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


def test_connected_components_driver_vs_distributed_parity(spark):
    # r09 opt: sub-cutoff inputs take a driver union-find instead of the
    # large/small-star rounds. Both paths must agree bit-for-bit, on
    # bigint AND string node ids (string min: Spark's binary-UTF8 order
    # equals Python's code-point order for valid UTF-8).
    edges = (
        [(1, 2), (2, 3), (7, 8), (9, 9)]
        + [(100, i) for i in range(90, 100)]
        + [(i, i + 1) for i in range(200, 230)]
    )
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    drv = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df, driver_cutoff=10**6).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df, driver_cutoff=0).collect()
    }
    assert drv == dist
    sdf = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("\u00e9a", "zz")],
        "id_a string, id_b string",
    )
    drv_s = {
        (r["node"], r["component"])
        for r in dedup.connected_components(sdf, driver_cutoff=10**6).collect()
    }
    dist_s = {
        (r["node"], r["component"])
        for r in dedup.connected_components(sdf, driver_cutoff=0).collect()
    }
    assert drv_s == dist_s


def test_dedup_clusters_end_to_end(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    out = dedup.dedup_clusters(d).collect()
    assert out, "expected at least one near-dup cluster in the fixture corpus"
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], []).append(r["doc_id"])
    for comp, members in by_comp.items():
        assert comp == min(members)  # component label is the min member id
        assert len(members) >= 2  # every clustered node came from a pair
    # cluster_size agrees with membership
    sizes = {r["component"]: r["cluster_size"] for r in out}
    for comp, members in by_comp.items():
        assert sizes[comp] == len(members)


def test_ngram_jaccard_plans_agree(spark, sf_dir):
    # PPJoin prefix filtering is exactness-preserving: both join
    # strategies must return identical pairs (the auto default picks
    # between them on the df profile)
    docs = load(spark, sf_dir, "documents").limit(200)
    posting = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, prefix_filter=False
        ).collect()
    }
    ppjoin = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, prefix_filter=True
        ).collect()
    }
    assert posting == ppjoin and len(posting) > 0
    auto = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert auto == posting


def test_embedding_auto_default_small_is_exact(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]) for r in
        dedup.embedding_dup_pairs(emb, threshold=0.4, lsh_bits=0).collect()
    }
    auto = {
        (r["id_a"], r["id_b"]) for r in
        dedup.embedding_dup_pairs(emb, threshold=0.4).collect()
    }
    assert auto == exact and len(exact) > 0
    # LSH path returns a SUBSET of the exact pairs (candidate pruning
    # only drops pairs, never fabricates them)
    lsh = {
        (r["id_a"], r["id_b"]) for r in
        dedup.embedding_dup_pairs(emb, threshold=0.4, lsh_bits=8).collect()
    }
    assert lsh <= exact


# ------------------------------------------------------------------ #
# SemDeDup: deterministic k-means + intra-cluster cosine prune
# ------------------------------------------------------------------ #
def test_kmeans_deterministic_and_partitioning(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    a1, c1 = dedup.kmeans_embeddings(emb, k=4, n_iter=2)
    a2, c2 = dedup.kmeans_embeddings(emb, k=4, n_iter=2)
    assert c1 == c2  # bit-identical centroids across runs
    m1 = {r["vec_id"]: r["cell"] for r in a1.collect()}
    m2 = {r["vec_id"]: r["cell"] for r in a2.collect()}
    assert m1 == m2
    assert set(m1.values()) <= set(range(4))
    # every row assigned exactly once
    assert len(m1) == emb.count()


def test_kmeans_iterations_reduce_inertia(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    X = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}

    def inertia(assigned, cents):
        C = np.array(cents)
        return sum(
            float(np.sum((X[r["vec_id"]] - C[r["cell"]]) ** 2))
            for r in assigned.collect()
        )

    a0, c0 = dedup.kmeans_embeddings(emb, k=4, n_iter=0)
    a3, c3 = dedup.kmeans_embeddings(emb, k=4, n_iter=3)
    assert inertia(a3, c3) <= inertia(a0, c0) + 1e-9


def test_semantic_dedup_finds_planted_copies(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    out = dedup.semantic_dedup(
        emb.unionByName(planted), k=4, n_iter=1, threshold=0.999
    ).collect()
    n_planted = planted.count()
    assert sum(r["n_dropped"] for r in out) == n_planted
    assert sum(r["n_dup_pairs"] for r in out) == n_planted
    assert sum(r["n_members"] for r in out) == emb.count() + n_planted


def test_duplicated_gram_stats_exactsubstr_signal(spark):
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, shared + " tail a b c"),
            (2, "prefix x y " + shared),
            (3, "totally different words with no overlap at all here ok"),
            (4, "short text"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.duplicated_gram_stats(docs, n=8).collect()}
    # doc 1: 12 tokens -> 5 gram slots; slot 0 is the shared gram
    assert out[1]["n_grams"] == 5 and out[1]["n_dup_occ"] == 1
    assert out[1]["n_dup_distinct"] == 1
    # doc 2: 11 tokens -> 4 slots; the shared gram is the last slot
    assert out[2]["n_grams"] == 4 and out[2]["n_dup_occ"] == 1
    # doc 3: no cross-document gram
    assert out[3]["n_dup_occ"] == 0 and out[3]["n_grams"] == 3
    # doc 4: shorter than n -> zero slots
    assert out[4]["n_grams"] == 0 and out[4]["n_dup_occ"] == 0


def test_dedup_lines_sep_mode(spark):
    rows = [
        (1, "keep me\nBOILERPLATE FOOTER\nunique one"),
        (2, "BOILERPLATE FOOTER\nunique two"),
        (3, "solo document\nnothing shared"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_lines(df, min_count=2).collect()
    }
    assert len(out) == 5  # every doc survives, even empty/None
    assert out[1]["text_clean"] == "keep me\nunique one"
    assert out[1]["n_removed"] == 1 and out[1]["n_kept"] == 2
    assert out[2]["text_clean"] == "unique two"
    assert out[3]["n_removed"] == 0
    # docs 4 and 5 both reduce to the single line '' which appears in
    # 2 distinct docs -> removed (min_line_chars=0 counts it)
    assert out[4]["n_removed"] == 1 and out[4]["text_clean"] == ""
    assert out[5]["n_removed"] == 1


def test_dedup_lines_min_line_chars_exempts_short_lines(spark):
    rows = [
        (1, "x\nshared long line here\nalpha"),
        (2, "x\nshared long line here\nbeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_lines(df, min_count=2, min_line_chars=3).collect()
    }
    # 'x' is duplicated but exempt (len < 3); the long line is removed
    assert out[1]["text_clean"] == "x\nalpha"
    assert out[2]["text_clean"] == "x\nbeta"
    assert out[1]["n_removed"] == 1


def test_dedup_lines_word_window_mode(spark):
    # 8-word windows: doc 1 and 2 share their first window exactly
    shared = "a b c d e f g h"
    rows = [(1, shared + " tail one"), (2, shared + " tail two"), (3, "totally different words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_lines(df, words_per_line=8, min_count=2).collect()
    }
    assert out[1]["text_clean"] == "tail one"
    assert out[2]["text_clean"] == "tail two"
    assert out[3]["n_removed"] == 0 and out[3]["n_kept"] == 1


def test_dedup_against_index_round_trip(spark, tmp_path):
    hist_rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different historical content about spark plans"),
        (3, "a third unrelated document with its own words entirely here"),
    ]
    new_rows = [
        (10, hist_rows[0][1]),  # exact dup of doc 1
        (11, "the quick brown fox jumps over the lazy dog again and AGAIN"),  # near-dup
        (12, "fresh never-seen content nothing like the corpus at all ok"),
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    path = str(tmp_path / "mhidx")
    dedup.minhash_index_write(hist, path, k=64, bands=16)
    ib, ih = dedup.minhash_index_read(spark, path)

    out = {r["doc_id"]: r for r in
           dedup.dedup_against_index(new, ib, ih, k=64, bands=16).collect()}
    assert len(out) == 3
    # exact dup: flagged, matches doc 1
    assert out[10]["is_exact_dup"] and out[10]["first_match_id"] == 1
    # near dup: not exact, but LSH candidates hit doc 1
    assert not out[11]["is_exact_dup"]
    assert out[11]["n_index_candidates"] >= 1 and out[11]["first_match_id"] == 1
    # fresh: clean
    assert not out[12]["is_exact_dup"] and out[12]["n_index_candidates"] == 0
    assert out[12]["first_match_id"] is None


def test_select_cluster_representatives(spark):
    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2), (20, 20, 1)],
        "doc_id long, component long, cluster_size long",
    )
    quality = spark.createDataFrame(
        # cluster 1: doc 2 best; cluster 10: tie -> smaller id (10);
        # cluster 20: singleton; doc 3 has no quality row (null -> -inf)
        [(1, 0.5), (2, 0.9), (10, 0.7), (11, 0.7), (20, 0.1)],
        "doc_id long, quality double",
    )
    out = {r["doc_id"]: r for r in
           dedup.select_cluster_representatives(clusters, quality).collect()}
    keeps = {d for d, r in out.items() if r["keep"]}
    assert keeps == {2, 10, 20}
    assert out[3]["quality"] is None and not out[3]["keep"]
    # exactly one keep per component
    from collections import Counter
    per_comp = Counter(r["component"] for r in out.values() if r["keep"])
    assert all(v == 1 for v in per_comp.values()) and len(per_comp) == 3


def test_select_cluster_representatives_string_ids(spark):
    # real corpus ids are strings (URLs, UUIDs) — the keep policy must
    # not do arithmetic on the id column (round-4 ADVICE: unary minus
    # on a string casts to double -> NULL -> every keep=false).
    clusters = spark.createDataFrame(
        [
            ("https://a.example/x", "c1", 3),
            ("https://b.example/y", "c1", 3),
            ("https://c.example/z", "c1", 3),
            ("uuid-9000", "c2", 2),
            ("uuid-0001", "c2", 2),
        ],
        "doc_id string, component string, cluster_size long",
    )
    quality = spark.createDataFrame(
        # c1: b best; c2: tie -> lexicographically smaller id
        [
            ("https://a.example/x", 0.2),
            ("https://b.example/y", 0.8),
            ("uuid-9000", 0.5),
            ("uuid-0001", 0.5),
        ],
        "doc_id string, quality double",
    )
    out = {r["doc_id"]: r for r in
           dedup.select_cluster_representatives(clusters, quality).collect()}
    keeps = {d for d, r in out.items() if r["keep"]}
    assert keeps == {"https://b.example/y", "uuid-0001"}


def test_remove_duplicated_spans(spark):
    boiler = "one two three four five six seven eight"  # 8-token span
    rows = [
        (1, f"alpha {boiler} beta"),
        (2, f"gamma delta {boiler}"),
        (3, "totally unique words in this document here now"),
        (4, "short doc"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.remove_duplicated_spans(df, n=8).collect()}
    assert len(out) == 5
    # the shared span is removed from BOTH docs; survivors keep order.
    # doc 1: windows at offsets 1..3 all duplicated? only the exact
    # 8-token window ['one'..'eight'] repeats in doc 2 (different
    # context), so exactly those 8 tokens are covered.
    assert out[1]["text_clean"] == "alpha beta"
    assert out[1]["n_removed"] == 8 and out[1]["n_kept"] == 2
    assert out[2]["text_clean"] == "gamma delta"
    assert out[3]["n_removed"] == 0
    assert out[3]["text_clean"] == rows[2][1]
    # shorter than n: no windows, passes through
    assert out[4]["text_clean"] == "short doc" and out[4]["n_removed"] == 0
    assert out[5]["text_clean"] == "" and out[5]["n_tokens"] == 0

    # scope='any' also catches within-doc repetition
    rep = spark.createDataFrame(
        [(1, ("x y z w a b c d " * 2).strip() + " tail")],
        "doc_id long, text string",
    )
    got = dedup.remove_duplicated_spans(rep, n=8, scope="any").first()
    assert got["n_removed"] >= 8
