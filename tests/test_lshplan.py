"""LSH banding planner (stages/lshplan.py): closed-form S-curve math."""

import numpy as np
import pytest

from raydedup.stages.lshplan import lsh_candidate_prob, lsh_plan


def test_prob_limits_and_monotonicity():
    j = np.linspace(0, 1, 101)
    p = lsh_candidate_prob(j, bands=16, rows=8)
    assert p[0] == 0.0 and p[-1] == 1.0
    assert (np.diff(p) >= -1e-15).all()  # nondecreasing in j
    # more bands at fixed rows -> higher detection probability
    assert (
        lsh_candidate_prob(0.6, 32, 8) > lsh_candidate_prob(0.6, 16, 8)
    )


def test_plan_table_shape_and_recommendation():
    t = lsh_plan(128, 0.8).to_pandas().sort_values("bands").reset_index(drop=True)
    # one row per divisor of 128
    assert t.bands.tolist() == [1, 2, 4, 8, 16, 32, 64, 128]
    assert (t.bands * t.rows_per_band == 128).all()
    # thresholds decrease as bands grow; p_at_tau increases
    assert (np.diff(t.threshold.to_numpy()) < 0).all()
    # nondecreasing (saturates at exactly 1.0 for the widest layouts)
    assert (np.diff(t.p_at_tau.to_numpy()) >= 0).all()
    assert t.is_recommended.sum() == 1
    rec = t[t.is_recommended].iloc[0]
    # at tau=0.8 the 16x8 default only reaches p ~0.947, so the planner
    # recommends 32x4 (threshold 0.42 <= tau, p_at_tau ~1.0, closest
    # qualifying threshold below tau)
    assert (rec.bands, rec.rows_per_band) == (32, 4)
    assert rec.p_at_tau >= 0.99
    # the flagship's own 16x8 row carries the honest 0.947 detection
    r16 = t[t.bands == 16].iloc[0]
    assert 0.94 < r16.p_at_tau < 0.96


def test_plan_validation():
    with pytest.raises(ValueError):
        lsh_plan(0, 0.8)
    with pytest.raises(ValueError):
        lsh_plan(128, 1.0)
