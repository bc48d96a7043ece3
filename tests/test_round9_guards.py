"""Round-9 guards: default-on caps + overflow reports for the pair
operators, the fixed-width full-extent guard, kcore non-converged degree
consistency, the _lc_supersede materialize-before-release contract, and
harmonic centrality vs exact BFS."""

import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------- #
# association_rules: cap ON by default, one distinct hash-agg shared
# --------------------------------------------------------------------- #
def test_association_rules_default_cap_bounds_star_basket(spark):
    from hail_spark.operators.relational import (
        association_rules,
        association_rules_overflow,
    )

    # one degenerate basket holding 1000 items + many small baskets;
    # default cap (256) must DROP the star basket from pair generation
    # while N and item supports keep counting it
    rows = [(0, i) for i in range(1000)]
    rows += [(b, i) for b in range(1, 40) for i in (1, 2)]
    df = spark.createDataFrame(rows, "basket long, item long")
    out = association_rules(
        df, "basket", "item", min_support_count=5
    ).collect()
    # pair (1,2) co-occurs in 39 small baskets + the dropped star
    r = {(x["antecedent"], x["consequent"]): x for x in out}
    assert (1, 2) in r and r[(1, 2)]["n_pair"] == 39
    # supports use N = 40 baskets (the dropped star still counted in N)
    assert abs(r[(1, 2)]["support"] - 39 / 40.0) < 1e-12
    # confidence = n_pair / n_a with n_a counting the star (40 baskets)
    assert abs(r[(1, 2)]["confidence"] - 39 / 40.0) < 1e-12
    ov = association_rules_overflow(df, "basket", "item").collect()
    assert [(x["basket"], x["n_items"]) for x in ov] == [(0, 1000)]
    # uncapped, the star basket contributes pairs
    un = association_rules(
        df, "basket", "item", min_support_count=5, max_basket_size=None
    ).collect()
    ru = {(x["antecedent"], x["consequent"]): x for x in un}
    assert ru[(1, 2)]["n_pair"] == 40


# --------------------------------------------------------------------- #
# sparse_cosine_topk: stop-word cap ON by default, overflow reported
# --------------------------------------------------------------------- #
def test_sparse_cosine_default_cap_and_overflow(spark):
    from hail_spark.llmdata.similarity import (
        sparse_cosine_overflow,
        sparse_cosine_topk,
    )

    docs = spark.createDataFrame(
        [(i, f"the unique{i} alpha") for i in range(30)]
        + [(100, "alpha beta"), (101, "alpha beta")],
        "doc_id long, text string",
    )
    # with max_df=5 the 'the'/'alpha' stop words leave the join; docs
    # 100/101 still pair via 'beta' (df=2)
    out = sparse_cosine_topk(docs, k=2, max_df=5).collect()
    top = {
        r["doc_id"]: r["other_id"] for r in out if r["rank"] == 1
    }
    assert top.get(100) == 101 and top.get(101) == 100
    ov = sparse_cosine_overflow(docs, max_df=5).collect()
    assert {r["term"] for r in ov} == {"the", "alpha"}
    assert all(r["n_docs"] > 5 for r in ov)
    # default cap (10k) is inert on a tiny corpus
    assert sparse_cosine_overflow(docs).count() == 0


# --------------------------------------------------------------------- #
# import_fixed_width fast path: full-extent guard
# --------------------------------------------------------------------- #
def test_fixed_width_fast_path_trailing_sentinel_raises(spark, tmp_path):
    from hail_spark.io.impex import import_fixed_width

    fields = [("name", 1, 4, "string"), ("qty", 5, 3, "int")]
    # a line ENDING in the \x01\x02\x03 separator WITHIN the declared
    # extent: the CSV parser swallows the trailing separator + empty
    # token, so the line arrives 3 bytes short of the extent (7) — the
    # length guard must raise instead of silently parsing a truncated
    # tail (the qty field would otherwise read garbage/empty)
    tail = tmp_path / "tail.txt"
    tail.write_bytes(b"HDRXXXX\nabcd123\nefgh\x01\x02\x03\n")
    with pytest.raises(Exception, match="extent"):
        import_fixed_width(
            spark, str(tail), fields, skip_header=1,
            splittable_header_skip=True,
        ).df.collect()
    # a trailing sentinel BEYOND the extent loses only bytes the
    # declared fields never read — the parse stays correct
    beyond = tmp_path / "beyond.txt"
    beyond.write_bytes(b"HDRXXXX\nabcd123\nefgh456\x01\x02\x03\n")
    t2 = import_fixed_width(
        spark, str(beyond), fields, skip_header=1,
        splittable_header_skip=True,
    )
    assert sorted(map(tuple, t2.df.collect())) == [
        ("abcd", 123), ("efgh", 456)
    ]
    # ragged short lines also raise loudly on this opt-in path
    rag = tmp_path / "rag.txt"
    rag.write_bytes(b"HDRXXXX\nabcd123\nefgh4\n")
    with pytest.raises(Exception, match="extent"):
        import_fixed_width(
            spark, str(rag), fields, skip_header=1,
            splittable_header_skip=True,
        ).df.collect()
    # the byte-exact default path still accepts both
    t = import_fixed_width(spark, str(rag), fields, skip_header=1)
    got = sorted(map(tuple, t.df.collect()))
    assert got == [("abcd", 123), ("efgh", 4)]


# --------------------------------------------------------------------- #
# kcore: non-converged output degrees are within the returned node set
# --------------------------------------------------------------------- #
def test_kcore_nonconverged_degrees_internally_consistent(spark):
    from hail_spark.operators.graph import kcore

    # path graph 0-1-2-...-9 with k=2: full peeling erases everything
    # (a path has no 2-core); with n_iter=1 the peel stops after one
    # round — returned degrees must count edges within the RETURNED
    # node set only
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    out = kcore(edges, k=2, n_iter=1).collect()
    nodes = {r["node"] for r in out}
    deg = {r["node"]: r["core_degree"] for r in out}
    # round 1 peels endpoints 0 and 9; the final >=k filter then drops
    # 1 and 8 (degree 1 in the peeled path), so the returned set is
    # {2..7} — and the recomputed degrees count edges within THAT set:
    # nodes 2 and 7 have within-set degree 1, NOT the stale pre-filter
    # 2 (which counted their edges to the dropped nodes 1 and 8)
    assert nodes == set(range(2, 8))
    assert deg[2] == 1 and deg[7] == 1
    assert all(deg[n] == 2 for n in range(3, 7))
    # converged run: the 2-core of a path is empty
    assert kcore(edges, k=2, n_iter=20).count() == 0
    # and a real 2-core is untouched: a 4-cycle survives with degree 2
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    got = {(r["node"], r["core_degree"]) for r in kcore(cyc, k=2).collect()}
    assert got == {(n, 2) for n in range(4)}


# --------------------------------------------------------------------- #
# _lc_supersede: releasing against a lazy successor must be loud
# --------------------------------------------------------------------- #
def test_lc_supersede_rejects_lazy_successor(spark):
    from hail_spark.operators.graph import _lc_supersede

    ck = spark.range(10).localCheckpoint()
    lazy = ck.filter(F.col("id") > 3)  # NOT materialized
    with pytest.raises(AssertionError, match="materialized checkpoint"):
        _lc_supersede(ck, lazy)
    # a materialized successor is accepted and returned
    nxt = lazy.localCheckpoint()
    assert _lc_supersede(ck, nxt) is nxt
    assert nxt.count() == 6


# --------------------------------------------------------------------- #
# harmonic centrality vs exact BFS on a small directed graph
# --------------------------------------------------------------------- #
def test_harmonic_centrality_matches_exact_bfs(spark):
    from hail_spark.operators.graph import harmonic_centrality

    # directed edges; incoming harmonic of v = sum over u!=v of
    # 1/d(u, v) along edge direction u -> ... -> v
    E = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)]
    edges = spark.createDataFrame(E, "src long, dst long")

    # exact all-pairs BFS on the tiny graph
    nodes = sorted({x for e in E for x in e})
    adj = {n: [] for n in nodes}
    for s, d in E:
        adj[s].append(d)

    def dists_from(s):
        dd, frontier, r = {s: 0}, [s], 0
        while frontier:
            r += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dd:
                        dd[v] = r
                        nxt.append(v)
            frontier = nxt
        return dd

    radius = 4
    want = {}
    for v in nodes:
        h = td = 0.0
        nreach = 1
        for u in nodes:
            if u == v:
                continue
            d = dists_from(u).get(v)
            if d is not None and d <= radius:
                h += 1.0 / d
                td += d
                nreach += 1
        want[v] = (h, nreach, (nreach - 1) / td if td else 0.0)

    got = {
        r["node"]: (r["harmonic"], int(r["n_reachable"]), r["closeness"])
        for r in harmonic_centrality(edges, radius=radius).collect()
    }
    assert set(got) == set(want)
    for v in nodes:
        assert math.isclose(got[v][0], want[v][0], rel_tol=1e-9), v
        assert got[v][1] == want[v][1], v
        assert math.isclose(got[v][2], want[v][2], rel_tol=1e-9), v


# --------------------------------------------------------------------- #
# pure-stdlib PNG codec: decodable in-container with NO PIL
# --------------------------------------------------------------------- #
def test_png_roundtrip_and_variants():
    import numpy as np

    from hail_spark.llmdata.multimodal import (
        _decode_png,
        _encode_png,
        _png_chunk,
        _PNG_SIG,
    )

    rng = np.random.default_rng(21)
    arr = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    assert (_decode_png(_encode_png(arr)) == arr).all()

    import struct as s
    import zlib

    def make(w, h, ctype, nch, raw_rows, plte=None):
        ihdr = s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        png = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            png += _png_chunk(b"PLTE", plte)
        png += _png_chunk(b"IDAT", zlib.compress(raw_rows))
        return png + _png_chunk(b"IEND", b"")

    # grayscale replicates to 3 channels
    g = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(5))
    got = _decode_png(make(4, 5, 0, 1, raw))
    assert (got == np.repeat(g[..., None], 3, axis=2)).all()

    # palette lookup
    pal = bytes(range(30))  # 10 RGB entries
    idx = np.array([[0, 3], [9, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    got = _decode_png(make(2, 2, 3, 1, raw, plte=pal))
    want = np.frombuffer(pal, np.uint8).reshape(10, 3)[idx]
    assert (got == want).all()

    # RGBA drops alpha
    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    got = _decode_png(make(3, 3, 6, 4, raw))
    assert (got == rgba[..., :3]).all()


def test_png_unfilters_all_filter_types():
    import struct as s
    import zlib

    import numpy as np

    from hail_spark.llmdata.multimodal import (
        _decode_png,
        _png_chunk,
        _PNG_SIG,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    nch, stride = 3, w * 3
    scan = img.reshape(h, stride).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    # forward-filter each row with types [0, 1, 2, 3, 4] per PNG §9
    ftypes = [0, 1, 2, 3, 4]
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        t = ftypes[y]
        cur = scan[y]
        row = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) >> 1,
                4: paeth(a, b, c),
            }[t]
            row[x] = (cur[x] - pred) & 0xFF
        out += bytes([t]) + bytes(row.astype(np.uint8))
        prev = cur
    ihdr = s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )
    assert (_decode_png(png) == img).all()


def test_png_unsupported_variants_stay_loud():
    import struct as s
    import zlib

    import numpy as np

    from hail_spark.llmdata.multimodal import (
        _decode_image,
        _png_chunk,
        _PNG_SIG,
    )

    # interlaced flag set: recognized container, undecodable without
    # PIL -> the dispatcher must RAISE, not stub (poisoned hashes)
    ihdr = s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(2 * (1 + 6))))
        + _png_chunk(b"IEND", b"")
    )
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(ValueError, match="interlaced|8-bit"):
            _decode_image(png)


def test_image_dhash_png_without_pil(spark):
    import numpy as np

    from hail_spark.llmdata.multimodal import (
        _encode_png,
        encode_bmp,
        image_dhash,
    )

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    png, bmp = _encode_png(arr), encode_bmp(arr)
    df = spark.createDataFrame(
        [(1, png), (2, bmp)], "asset_id long, content binary"
    )
    hashes = {r["asset_id"]: r["dhash"] for r in image_dhash(df).collect()}
    # PNG is lossless: both containers hold the same pixels, so the
    # full decode->dHash pipeline agrees across codecs — and this runs
    # with NO PIL in the container (stdlib zlib path)
    assert hashes[1] == hashes[2]
