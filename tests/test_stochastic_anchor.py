"""Opt-in statistical anchor for stochastic-regularizer training equivalence
(VERDICT r2 item 4). Runs tools/stochastic_anchor.py at a reduced size
(~10 min CPU); the committed full-size results live in
tools/stochastic_anchor_{hwgate,dgcn}.json and COVERAGE.md.

Opt in with RUN_STAT=1.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_STAT") != "1", reason="statistical anchor; set RUN_STAT=1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("family,n_seeds,epochs", [("hwgate", 4, 20),
                                                   ("dgcn", 4, 12)])
def test_stochastic_training_indistinguishable(family, n_seeds, epochs):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "stochastic_anchor.py"),
         family, str(n_seeds), str(epochs)],
        capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    # the distributions must be statistically indistinguishable: a two-sided
    # Mann-Whitney U on the final-epoch train loss must NOT reject at 1%
    assert rec["mann_whitney_p_loss"] > 0.01, rec
    # and the stochastic path must not systematically hurt accuracy
    assert rec["mean_acc_ours"] >= rec["mean_acc_torch"] - 0.15, rec
