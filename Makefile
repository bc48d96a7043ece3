# Single entry point for the local evidence chain (r03 verdict item 10):
#   make verify   — oracle gate at sf0.01 AND sf0.001 (the two-SF guard
#                   that kills corpus-pinned / type-divergent oracles),
#                   then the plan audit (pushdown / cartesian / wide-scan).
#   make test     — full pytest suite.
#   make bench    — median-of-3 suite bench at sf0.1 (writes BENCH.json).

PY ?= python

.PHONY: verify gate gate-small audit test bench

verify: gate gate-small audit

gate:
	$(PY) scripts/verify_local.py /root/testdata/sf0.01

gate-small:
	$(PY) scripts/verify_local.py /root/testdata/sf0.001

audit:
	$(PY) scripts/audit_plans.py

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py
