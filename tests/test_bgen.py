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
