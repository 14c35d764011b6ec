# Test gates. The default tier is what `python -m pytest tests/` runs (CI,
# ~6 min on a CPU host); `ci-full` is the second gate that re-validates the
# strongest evidence — full-model Pallas parity, matched-training anchors,
# e2e CLI runs, multi-process DCN — before a release/round ends.

PY ?= python

.PHONY: ci ci-slow ci-dist ci-stat ci-full

ci:
	$(PY) -m pytest tests/ -q

# Heavy parity / e2e / learning tests (the `slow` marker tier).
ci-slow:
	$(PY) -m pytest tests/ -q -m slow

# Multi-process DCN tests (2 localhost processes over a CPU mesh).
ci-dist:
	RUN_DIST=1 $(PY) -m pytest tests/test_multiprocess_dcn.py -q -m slow

# N-seed stochastic-regularizer anchors (minutes; statistical, not bitwise).
ci-stat:
	RUN_STAT=1 $(PY) -m pytest tests/test_stochastic_anchor.py -q -m slow

# Everything: default tier + slow tier with all env gates open. This is the
# round-end gate — it executes the matched-training / full-model Pallas /
# RUN_SLOW-gated anchors that the default tier deselects for speed.
ci-full:
	$(PY) -m pytest tests/ -q
	RUN_SLOW=1 RUN_DIST=1 RUN_STAT=1 $(PY) -m pytest tests/ -q -m slow
