# Round-exit gate: run `make check` as the LAST act before recording
# artifacts — round 3 shipped with its own plan-audit test red because the
# final full-suite run was skipped. `check` is the full gate; `quickcheck`
# is the fast inner loop (plan audit + all 132 DuckDB oracles at sf0.01).

.PHONY: check quickcheck bench

check:
	python -m pytest tests/ -q

quickcheck:
	python -m pytest tests/test_plans.py tests/test_queries_oracle.py -q

bench:
	python bench.py
