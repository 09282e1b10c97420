"""Exact LMG (Lindeman-Merenda-Gold) relative importance.

Reference: ``kda.relative_importance`` in key_driver_analysis
(ct_data.py:55-64) — the Shapley decomposition of the regression R² over
features: feature i's importance is the average, over all orderings of
the features, of the R² increase when i enters the model.

Division of labor at scale: Spark computes the (p+1)×(p+1) Pearson
correlation matrix distributed (one pass over the fact table —
pyspark.ml.stat.Correlation); this module runs on the DRIVER over that
tiny matrix. Every subset R² needed by the Shapley sum is a function of
the correlation matrix alone (R²(S) = r_yS' R_SS⁻¹ r_yS — R² is
invariant to standardization), so the exact decomposition costs
O(2^p · p³) driver-side flops with zero extra cluster passes. For the
reference's feature counts (≤ ~20) that is milliseconds; beyond ~25
features, sample orderings instead (the standard LMG estimator).
"""

from __future__ import annotations

from itertools import combinations
from math import factorial

import numpy as np


def subset_r2(corr: np.ndarray, subset: tuple[int, ...]) -> float:
    """R² of regressing the target (index 0 of ``corr``) on the feature
    subset (1-based feature indices shifted to 0-based within the feature
    block): r_yS' R_SS⁻¹ r_yS.

    Degenerate inputs degrade instead of raising, matching the
    reference's regression-based kda behavior: a constant feature yields
    NaN Pearson entries (treated as zero correlation — it can explain
    nothing), and perfectly collinear subsets make R_SS singular (solved
    with the pseudo-inverse via lstsq, which returns the minimum-norm
    coefficients and the correct explained variance)."""
    if not subset:
        return 0.0
    idx = list(subset)
    ryx = np.nan_to_num(corr[0, 1:][idx])
    rxx = np.nan_to_num(corr[1:, 1:][np.ix_(idx, idx)])
    np.fill_diagonal(rxx, 1.0)
    beta, *_ = np.linalg.lstsq(rxx, ryx, rcond=None)
    return float(ryx @ beta)


def lmg_relative_importance(corr: np.ndarray) -> np.ndarray:
    """Exact LMG shares from a correlation matrix whose row/col 0 is the
    target. Returns one share per feature; the shares sum to the full
    model's R² (the defining property of the Shapley decomposition).

    Computed subset-wise rather than permutation-wise: the marginal
    contribution of feature i after subset S appears in
    |S|!·(p-1-|S|)! of the p! orderings, so

        LMG_i = Σ_{S ⊆ F\\{i}}  |S|!(p-1-|S|)!/p! · (R²(S∪{i}) − R²(S))
    """
    p = corr.shape[0] - 1
    cache: dict[tuple[int, ...], float] = {}

    def r2(s: tuple[int, ...]) -> float:
        if s not in cache:
            cache[s] = subset_r2(corr, s)
        return cache[s]

    out = np.zeros(p)
    for i in range(p):
        others = [j for j in range(p) if j != i]
        for k in range(p):
            w = factorial(k) * factorial(p - 1 - k) / factorial(p)
            for s in combinations(others, k):
                with_i = tuple(sorted(s + (i,)))
                out[i] += w * (r2(with_i) - r2(s))
    return out
