"""LAPJV vs scipy linear_sum_assignment: optimal-cost parity.

The reference vendors LAPJV as an alternate LAP backend
(src/sgtd/include/lapjav.hpp, src/sgtd/src/lapjav.cpp); its active path
uses the scipy-port LSAP instead (Semantic_Graph.hpp:440). Optimal cost
must agree with scipy on every instance (assignments may differ on ties).
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sgtd_tpu.match.lapjv import lapjv


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("shape", [(1, 1), (5, 5), (20, 20), (7, 13), (32, 64)])
def test_lapjv_matches_scipy(seed, shape):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 10, shape)
    r2c, c2r, total = lapjv(cost)
    ri, ci = linear_sum_assignment(cost)
    assert np.isclose(total, cost[ri, ci].sum()), (total, cost[ri, ci].sum())
    # Valid assignment structure.
    n, m = shape
    assert sorted(set(r2c.tolist())) == sorted(r2c.tolist())  # injective
    assert np.all((r2c >= 0) & (r2c < m))
    for j in range(m):
        if c2r[j] >= 0:
            assert r2c[c2r[j]] == j


def test_lapjv_integer_costs_with_ties():
    rng = np.random.default_rng(3)
    cost = rng.integers(0, 4, (16, 16)).astype(float)
    _, _, total = lapjv(cost)
    ri, ci = linear_sum_assignment(cost)
    assert np.isclose(total, cost[ri, ci].sum())


def test_lapjv_rejects_bad_shapes():
    with pytest.raises(ValueError):
        lapjv(np.zeros((3, 2)))
    with pytest.raises(ValueError):
        lapjv(np.zeros(3))
