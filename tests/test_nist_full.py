"""Full NIST StRD battery as a CI gate.

The reference treats the 27 NIST nonlinear-regression problems x 2
certified starts as its headline accuracy benchmark
(``examples/nist.cc:39-72``: Ceres TRUST_REGION scores average LRE 9.4,
41/54 "medals" at the 4.5-digit success bar). This test runs the whole
battery through the public API and enforces parity: average LRE >= 9.0
and >= 41 of 54 starts with LRE >= 4.5.
"""

import numpy as np
import pytest

from ceres_tpu.models import nist

DATA_DIR = "/root/reference/data/nist"


@pytest.mark.slow
@pytest.mark.slow
def test_full_nist_battery_parity():
    results = nist.run_suite(data_dir=DATA_DIR)
    assert len(results) == 54, f"expected 54 starts, got {len(results)}"
    lres = np.asarray([r["lre"] for r in results])
    avg = float(np.mean(lres))
    wins = int(np.sum(lres >= 4.5))
    detail = "\n".join(
        f"{r['name']:10s} start {r['start'] + 1}: LRE {r['lre']:5.2f}"
        for r in sorted(results, key=lambda r: r["lre"])[:8]
    )
    assert avg >= 9.0, f"avg LRE {avg:.2f} < 9.0; worst:\n{detail}"
    assert wins >= 41, f"wins {wins}/54 < 41; worst:\n{detail}"


# Eckerle4 deliberately excluded: its model is even in b2, so one start
# converges to the sign-mirrored twin (identical certified cost, LRE 0).
@pytest.mark.parametrize("name", ["Misra1a", "DanWood", "Misra1b", "Rat42"])
def test_nist_easy_problems_quick(name):
    """Fast smoke subset (both starts, LRE >= 4.5) for non-slow CI."""
    results = nist.run_suite(data_dir=DATA_DIR, names=[name])
    assert len(results) == 2
    for r in results:
        assert r["lre"] >= 4.5, results
