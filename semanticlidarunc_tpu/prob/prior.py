"""Dirichlet prior concentration solvers (host-side, run once at trainer init).

Port of /root/reference/src/utils/alpha_evid_prior.py. The reference uses
mpmath at 80 decimal digits for the Beta CDF bisection (:1-38); scipy's
regularized incomplete beta is accurate to ~1e-15 here, far below the 1e-8
bisection tolerance, so we use scipy (mpmath remains an optional cross-check
in tests).
"""
from __future__ import annotations

import math

from scipy import special as sp


def coverage(alpha0: float, p_star: float, h: float) -> float:
    """P(p in [p*-h, p*+h]) under Beta(p* a0, (1-p*) a0)."""
    a = p_star * alpha0
    b = (1.0 - p_star) * alpha0
    lo = max(0.0, p_star - h)
    hi = min(1.0, p_star + h)
    return float(sp.betainc(a, b, hi) - sp.betainc(a, b, lo))


def solve_alpha0_for_coverage(p_star: float, h: float, delta: float,
                              K: int = 20) -> tuple[float, float]:
    """Smallest alpha0 with >= 1-2*delta central mass in [p*-h, p*+h]
    (bisection, reference :14-38). Returns (alpha0, alpha0/K)."""
    target = 1.0 - 2.0 * delta
    lo, hi = 5.0, 1000.0
    while coverage(hi, p_star, h) < target and hi < 1e6:
        hi *= 2.0
    while coverage(lo, p_star, h) > target and lo > 1.0:
        lo /= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        cov = coverage(mid, p_star, h)
        if cov >= target:
            hi = mid
        else:
            lo = mid
        if abs(cov - target) < 1e-8 and (hi - lo) < 1e-6:
            break
    a0 = 0.5 * (lo + hi)
    return a0, a0 / K


def alpha0_from_variance(p_star: float, v_star: float, K: int = 20):
    """Variance-matching variant (reference :40-42)."""
    a0 = (p_star * (1.0 - p_star)) / v_star - 1.0
    return a0, a0 / K


def logit_threshold_for_alpha_cap(s_total: float, K: int, m: int = 3,
                                  margin: float = 0.10, T: float = 1.0):
    """Hinge threshold on logits keeping alpha0 <= s_total*(1+margin) when at
    most m classes are active (inverse softplus; reference :45-88).
    Returns (z_thr, a_thr)."""
    s_hi = s_total * (1.0 + margin)
    a_thr = max((s_hi - (K - m)) / m, 1.001)
    z_thr = T * math.log(math.expm1(a_thr - 1.0))
    return z_thr, a_thr
