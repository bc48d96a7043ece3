"""Two-scale-factor oracle guard (round-2 VERDICT item 2): every oracle
whose SQL pins constants (VALUES maps, seeded-simulation sums, λ
identities) must pass the gate at BOTH sf0.001 and sf0.01 — an oracle
accidentally pinned to one corpus size fails here before it can surface
as a driver-red row.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

from verify_local import run_gate  # noqa: E402

# Queries whose oracles embed constants that COULD be corpus-dependent:
# pinned VALUES maps, seeded simulations, identity-based pins.
PINNED = [
    "faf_by_nation",
    "lambda_gc_events",
    "balding_nichols_stats",
    "maximal_independent_set",
    "approx_cdf_struct",
]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_pinned_oracles_both_sfs(spark, sf_dir):
    results = run_gate(spark, sf_dir, only=set(PINNED))
    bad = {k: v for k, v in results.items() if not v.startswith(("OK", "rows-only"))}
    assert not bad, f"SF-pinned oracle regression at {sf_dir}: {bad}"
    assert len(results) == len(PINNED)


def test_full_gate_sf0001(spark):
    """Round-3 VERDICT item 3: EVERY oracle pair must pass the local
    gate at a second scale factor (sf0.001; the driver runs sf0.01), so
    no oracle can be corpus-pinned or DuckDB-type-divergent (HUGEINT/
    DECIMAL — the r03 driver-red class) again. ~6 min on local[32]."""
    results = run_gate(spark, "/root/testdata/sf0.001", only=None, workers=4)
    bad = {k: v for k, v in results.items() if not v.startswith(("OK", "rows-only"))}
    assert not bad, f"full-suite oracle regression at sf0.001: {bad}"
