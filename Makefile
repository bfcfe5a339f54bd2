# Round-opening ritual + common gates. The rotation map MUST be
# regenerated as the first action of every round, or the driver's
# 50-slot window re-checks last round's greens instead of the stalest
# cohort (tests/test_driver_rotation.py guards this by failing).

.PHONY: rotate fast test bench

rotate:
	python scripts/rebuild_driver_priority.py
	python -m pytest tests/test_driver_rotation.py -q

# the 50 queries the external driver will hard-check this round (~70 s)
fast:
	python -m pytest tests/test_oracle_parity.py -m fast -q

test:
	python -m pytest tests/ -q

bench:
	python bench.py
