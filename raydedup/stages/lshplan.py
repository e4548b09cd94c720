"""LSH banding planner: the S-curve math behind (bands, rows) choices.

The reference fixes its near-hash tolerance as compiled constants
(range ±2, ``util/Key.java:262,354``; band geometry implicit in the
64-bit hash layout). The transplant makes the equivalent knob — the
MinHash banding layout — a first-class, queryable planning table: for
every factorization ``bands x rows == n_perms``, the probability that
a pair with true Jaccard ``j`` collides in at least one band is

    p(j; b, r) = 1 - (1 - j^r)^b

and the S-curve's inflection threshold is approximately
``(1/b)^(1/r)``. ``lsh_plan`` evaluates every layout at the
configured acceptance tau (plus a near-miss and a sub-threshold
point), so choosing bands/rows for a target tau is a table lookup a
user can read — or an operator can join against — instead of folklore.

Pure closed-form arithmetic (no data touched): the table is tiny
(divisor count of n_perms) and the SQL oracle mirrors it exactly with
POWER(), making this one of the few operators whose oracle covers the
whole semantics with zero sampling error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PLAN_SCHEMA = pa.schema(
    [
        ("bands", pa.int64()),
        ("rows_per_band", pa.int64()),
        ("threshold", pa.float64()),
        ("p_at_tau", pa.float64()),
        ("p_at_tau_minus", pa.float64()),
        ("p_at_tau_plus", pa.float64()),
        ("is_recommended", pa.bool_()),
    ]
)


def lsh_candidate_prob(j, bands: int, rows: int):
    """P(candidate) = 1 - (1 - j^rows)^bands, vectorized over ``j``."""
    j = np.asarray(j, dtype=np.float64)
    return 1.0 - (1.0 - j**rows) ** bands


def lsh_plan(
    n_perms: int = 128,
    tau: float = 0.8,
    *,
    delta: float = 0.1,
) -> pa.Table:
    """Planning table over every ``bands x rows == n_perms`` layout.

    Columns: the layout, its S-curve threshold ``(1/b)^(1/r)``, the
    detection probability at ``tau`` and at ``tau ± delta``, and an
    ``is_recommended`` flag on the layout whose threshold is closest
    BELOW tau with p_at_tau >= 0.99 (ties -> fewer bands = cheaper
    index) — falling back to max p_at_tau if none qualifies."""
    if n_perms < 1:
        raise ValueError("n_perms must be >= 1")
    if not 0.0 < tau < 1.0:
        raise ValueError("tau must be in (0, 1)")
    bands = np.array(
        [b for b in range(1, n_perms + 1) if n_perms % b == 0], dtype=np.int64
    )
    rows = (n_perms // bands).astype(np.int64)
    thr = (1.0 / bands) ** (1.0 / rows)
    p_tau = 1.0 - (1.0 - np.float64(tau) ** rows) ** bands
    lo = np.float64(max(tau - delta, 0.0))
    hi = np.float64(min(tau + delta, 1.0))
    p_lo = 1.0 - (1.0 - lo**rows) ** bands
    p_hi = 1.0 - (1.0 - hi**rows) ** bands
    ok = (thr <= tau) & (p_tau >= 0.99)
    if ok.any():
        # closest threshold below tau; ties -> fewer bands
        cand = np.flatnonzero(ok)
        order = np.lexsort((bands[cand], tau - thr[cand]))
        best = cand[order[0]]
    else:
        best = int(np.argmax(p_tau))
    rec = np.zeros(bands.shape[0], dtype=bool)
    rec[best] = True
    return pa.table(
        {
            "bands": pa.array(bands, pa.int64()),
            "rows_per_band": pa.array(rows, pa.int64()),
            "threshold": pa.array(thr, pa.float64()),
            "p_at_tau": pa.array(p_tau, pa.float64()),
            "p_at_tau_minus": pa.array(p_lo, pa.float64()),
            "p_at_tau_plus": pa.array(p_hi, pa.float64()),
            "is_recommended": pa.array(rec),
        },
        schema=PLAN_SCHEMA,
    )
