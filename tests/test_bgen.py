"""BGEN v1.2 round-trip: synthesize a layout-2 file byte-by-byte from
the published spec, re-import, check GP/GT/missing recovery (the
reference's own strategy — its test BGENs are generated fixtures)."""

import numpy as np
import pytest

from hail_spark.io.bgen import export_bgen_test_file, import_bgen

VARIANTS = [
    ("rs1", "1", 1000, ["A", "G"]),
    ("rs2", "1", 2000, ["C", "T"]),
    ("rs3", "2", 55, ["G", "GA"]),
]
SAMPLES = ["NA1", "NA2", "NA3", "NA4"]


@pytest.fixture(scope="module", params=[True, False], ids=["zlib", "raw"])
def bgen_path(request, tmp_path_factory):
    rng = np.random.default_rng(11)
    gps = rng.dirichlet([1.0, 1.0, 1.0], size=(len(VARIANTS), len(SAMPLES)))
    gps[1, 2] = np.nan  # missing sample
    p = tmp_path_factory.mktemp("bgen") / f"toy_{request.param}.bgen"
    export_bgen_test_file(
        str(p), VARIANTS, gps, SAMPLES, bits=16, compress=request.param
    )
    return str(p), gps


def test_import_bgen_roundtrip(spark, bgen_path):
    path, gps = bgen_path
    mt = import_bgen(spark, path)
    assert [c["s"] for c in mt._cols] == SAMPLES
    rows = {r["rsid"]: r for r in mt._df.collect()}
    assert set(rows) == {"rs1", "rs2", "rs3"}
    assert rows["rs3"]["contig"] == "2" and rows["rs3"]["position"] == 55
    assert list(rows["rs3"]["alleles"]) == ["G", "GA"]
    for vi, (rsid, *_rest) in enumerate(VARIANTS):
        ents = rows[rsid]["__entries"]
        for j in range(len(SAMPLES)):
            if np.isnan(gps[vi, j, 0]):
                assert ents[j] is None
                continue
            got = np.array(ents[j]["GP"])
            # 16-bit quantization: |error| <= ~2/65535 per component
            np.testing.assert_allclose(got, gps[vi, j], atol=1e-4)
            assert abs(sum(got) - 1.0) < 1e-9
            assert ents[j]["GT"] == int(np.argmax(gps[vi, j]))


def test_offsets_cache(spark, bgen_path, tmp_path):
    import os

    path, _ = bgen_path
    assert os.path.exists(path + ".offsets.json")
    # cached second import produces identical results
    mt2 = import_bgen(spark, path)
    assert mt2._df.count() == 3


def test_nonbyte_aligned_bits(spark, tmp_path):
    rng = np.random.default_rng(5)
    gps = rng.dirichlet([1.0, 1.0, 1.0], size=(len(VARIANTS), len(SAMPLES)))
    p = str(tmp_path / "bits10.bgen")
    export_bgen_test_file(p, VARIANTS, gps, SAMPLES, bits=10)
    mt = import_bgen(spark, p)
    rows = {r["rsid"]: r for r in mt._df.collect()}
    for vi, (rsid, *_r) in enumerate(VARIANTS):
        for j in range(len(SAMPLES)):
            got = np.array(rows[rsid]["__entries"][j]["GP"])
            np.testing.assert_allclose(got, gps[vi, j], atol=2.5 / 1023)


def test_phased_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(7)
    # per-haplotype allele probs: (n_var, n_samp, 2 haps * 2 alleles)
    hap = rng.dirichlet([1.0, 1.0], size=(len(VARIANTS), len(SAMPLES), 2))
    gps = hap.reshape(len(VARIANTS), len(SAMPLES), 4)
    p = str(tmp_path / "phased.bgen")
    export_bgen_test_file(p, VARIANTS, gps, SAMPLES, bits=16, phased=True)
    mt = import_bgen(spark, p)
    rows = {r["rsid"]: r for r in mt._df.collect()}
    for vi, (rsid, *_r) in enumerate(VARIANTS):
        for j in range(len(SAMPLES)):
            e = rows[rsid]["__entries"][j]
            assert e["phased"] is True and e["ploidy"] == 2
            np.testing.assert_allclose(np.array(e["GP"]), gps[vi, j], atol=1e-4)
            want_gt = int((hap[vi, j].argmax(axis=1) != 0).sum())
            assert e["GT"] == want_gt


def test_triploid_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(9)
    # ploidy 3, biallelic: 4 genotypes
    gps = rng.dirichlet([1.0] * 4, size=(len(VARIANTS), len(SAMPLES)))
    p = str(tmp_path / "trip.bgen")
    export_bgen_test_file(p, VARIANTS, gps, SAMPLES, bits=16, ploidy=3)
    mt = import_bgen(spark, p)
    rows = {r["rsid"]: r for r in mt._df.collect()}
    for vi, (rsid, *_r) in enumerate(VARIANTS):
        for j in range(len(SAMPLES)):
            e = rows[rsid]["__entries"][j]
            assert e["ploidy"] == 3 and e["phased"] is False
            np.testing.assert_allclose(np.array(e["GP"]), gps[vi, j], atol=1e-4)


def test_mixed_ploidy_decode():
    """Hand-craft a mixed-ploidy unphased block (spec layout) and decode."""
    import struct as st

    from hail_spark.io.bgen import _decode_block, _pack_values

    # 3 samples, k=2: ploidies 1, 2, 3 → stored values 1, 2, 3
    bits = 16
    denom = (1 << bits) - 1
    body = st.pack("<IH", 3, 2) + bytes([1, 3]) + bytes([1, 2, 3]) + bytes([0, bits])
    probs = [0.25, 0.1, 0.6, 0.2, 0.3, 0.4]  # stored (last genotype implied)
    body += _pack_values(np.round(np.array(probs) * denom).astype(np.uint64), bits)
    gp, ploidy, missing, phased = _decode_block(body, 0)
    assert list(ploidy) == [1, 2, 3]
    assert not phased and not missing.any()
    np.testing.assert_allclose(gp[0], [0.25, 0.75], atol=1e-4)
    np.testing.assert_allclose(gp[1], [0.1, 0.6, 0.3], atol=1e-4)
    np.testing.assert_allclose(gp[2], [0.2, 0.3, 0.4, 0.1], atol=1e-4)


def test_export_bgen_distributed_roundtrip(spark, tmp_path, bgen_path):
    from hail_spark.io.bgen import export_bgen

    path, gps = bgen_path
    mt = import_bgen(spark, path)
    out = str(tmp_path / "rt.bgen")
    export_bgen(mt, out, bits=16)
    mt2 = import_bgen(spark, out)
    a = {r["rsid"]: r for r in mt._df.collect()}
    b = {r["rsid"]: r for r in mt2._df.collect()}
    assert set(a) == set(b)
    for rsid in a:
        for ea, eb in zip(a[rsid]["__entries"], b[rsid]["__entries"]):
            if ea is None:
                assert eb is None
                continue
            np.testing.assert_allclose(ea["GP"], eb["GP"], atol=2e-4)
            assert ea["GT"] == eb["GT"]


@pytest.mark.parametrize("compress", [True, False], ids=["zlib", "raw"])
def test_layout1_import(spark, tmp_path, compress):
    """Legacy BGEN v1.1 (layout 1): hand-write the file from the spec —
    3 uint16/32768 probabilities per sample, all-zero triple = missing."""
    import struct as st
    import zlib as zl

    probs = np.array(
        [
            [[0.9, 0.1, 0.0], [0.0, 0.0, 0.0], [0.2, 0.3, 0.5]],
            [[0.0, 1.0, 0.0], [0.25, 0.5, 0.25], [0.1, 0.8, 0.1]],
        ]
    )
    n_var, n_samp = probs.shape[:2]
    variants = [("rs1", "1", 100, ["A", "G"]), ("rs2", "2", 200, ["C", "T"])]
    flags = (1 if compress else 0) | (1 << 2)  # compression bits + layout 1
    header = st.pack("<III", 20, n_var, n_samp) + b"bgen" + st.pack("<I", flags)
    blob = st.pack("<I", 20) + header
    for (rsid, chrom, pos, alleles), vp in zip(variants, probs):
        blob += st.pack("<I", n_samp)
        blob += st.pack("<H", 0)
        blob += st.pack("<H", len(rsid)) + rsid.encode()
        blob += st.pack("<H", len(chrom)) + chrom.encode()
        blob += st.pack("<I", pos)
        for a in alleles:
            blob += st.pack("<I", len(a)) + a.encode()
        gt = np.round(vp * 32768).astype("<u2").tobytes()
        if compress:
            comp = zl.compress(gt)
            blob += st.pack("<I", len(comp)) + comp
        else:
            blob += gt
    p = tmp_path / f"l1_{compress}.bgen"
    p.write_bytes(blob)

    mt = import_bgen(spark, str(p))
    rows = {r["rsid"]: r for r in mt._df.collect()}
    assert set(rows) == {"rs1", "rs2"}
    assert rows["rs2"]["contig"] == "2" and rows["rs2"]["position"] == 200
    for vi, (rsid, *_r) in enumerate(variants):
        ents = rows[rsid]["__entries"]
        for j in range(n_samp):
            if probs[vi, j].sum() == 0:
                assert ents[j] is None
                continue
            np.testing.assert_allclose(ents[j]["GP"], probs[vi, j], atol=1e-4)
            assert ents[j]["GT"] == int(np.argmax(probs[vi, j]))
            assert ents[j]["ploidy"] == 2 and ents[j]["phased"] is False
