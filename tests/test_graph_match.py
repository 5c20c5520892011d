"""Legacy histogram + assignment coarse matcher."""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.match.graph_match import auction_assignment, graph_match


def test_auction_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    for trial in range(5):
        n, m = 12, 15
        cost = rng.uniform(0, 10, (n, m)).astype(np.float32)
        got = np.asarray(
            auction_assignment(jnp.asarray(cost), jnp.ones(n, bool))
        )
        ri, ci = linear_sum_assignment(cost)
        ref_cost = cost[ri, ci].sum()
        got_cost = cost[np.arange(n), got].sum()
        assert np.all(got >= 0)
        assert len(set(got.tolist())) == n  # one-to-one
        # Auction with finite eps is near-optimal; allow small slack.
        assert got_cost <= ref_cost + 0.2, (got_cost, ref_cost)


def test_graph_match_identical_graphs(rng):
    n_max = 32
    n = 20
    centers = np.zeros((n_max, 3), np.float32)
    centers[:n] = rng.uniform(-40, 40, (n, 3))
    labels = np.zeros(n_max, np.int32)
    labels[:n] = rng.integers(3, 12, n)
    density = np.zeros(n_max, np.float32)
    density[:n] = rng.uniform(0.5, 2.0, n)
    mask = np.zeros(n_max, bool)
    mask[:n] = True

    res = graph_match(
        jnp.asarray(centers), jnp.asarray(labels), jnp.asarray(density), jnp.asarray(mask),
        jnp.asarray(centers), jnp.asarray(labels), jnp.asarray(density), jnp.asarray(mask),
    )
    matches = np.asarray(res.matches)
    in_range = np.linalg.norm(centers, axis=1) <= 50.0
    expect = mask & in_range
    # Every in-range node matches itself.
    assert float(res.score) > 0.9
    good = matches[expect[:n].nonzero()[0]]
    frac_self = np.mean(good == expect[:n].nonzero()[0])
    assert frac_self > 0.9


def test_graph_match_unrelated_graphs_low_score(rng):
    n_max = 32

    def mk(seed):
        r = np.random.default_rng(seed)
        centers = np.zeros((n_max, 3), np.float32)
        centers[:15] = r.uniform(-40, 40, (15, 3))
        labels = np.zeros(n_max, np.int32)
        labels[:15] = r.integers(3, 12, 15)
        density = np.ones(n_max, np.float32)
        mask = np.zeros(n_max, bool)
        mask[:15] = True
        return centers, labels, density, mask

    a = mk(1)
    b = mk(99)
    res = graph_match(*(jnp.asarray(x) for x in a), *(jnp.asarray(x) for x in b))
    # Unrelated random scenes: the distance-consistency filter should kill
    # most matches.
    assert float(res.score) < 0.5
