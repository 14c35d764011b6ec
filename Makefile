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
# A pass writes a dated artifact (tools/ci_full_last.txt) recording the
# counts, so the strongest test tier is verifiable in-repo, not asserted
# (VERDICT r3 weak-item 6).
ci-full:
	@rm -f tools/ci_full_last.txt
	$(PY) -m pytest tests/ -q > /tmp/ci_default.out 2>&1 || { cat /tmp/ci_default.out; exit 1; }
	@tail -n 2 /tmp/ci_default.out
	RUN_SLOW=1 RUN_DIST=1 RUN_STAT=1 $(PY) -m pytest tests/ -q -m slow > /tmp/ci_slow.out 2>&1 || { cat /tmp/ci_slow.out; exit 1; }
	@tail -n 2 /tmp/ci_slow.out
	@{ echo "ci-full PASS $$(date -u +%Y-%m-%dT%H:%M:%SZ) commit $$(git rev-parse --short HEAD)"; \
	   echo "default tier: $$(tail -n 2 /tmp/ci_default.out | grep -o '[0-9]* passed.*')"; \
	   echo "slow tier (RUN_SLOW+RUN_DIST+RUN_STAT): $$(tail -n 2 /tmp/ci_slow.out | grep -o '[0-9]* passed.*')"; } \
	   > tools/ci_full_last.txt
	@cat tools/ci_full_last.txt
