"""PMF-draw helpers (draw_queries prior weighting)."""

import numpy as np


def test_draw_queries_prior_weighting():
    """draw_queries == sample_query_pmf on the renormalized product, and a
    concentrated prior dominates the draw (reference draw_queries,
    PW_NNAL.py:1023-1039)."""
    from nnal_tpu.scoring.pmf import draw_queries, sample_query_pmf

    q = np.full(10, 0.1)
    prior = np.zeros(10)
    prior[4] = 1.0
    picks = draw_queries(q, prior, 1, np.random.default_rng(0))
    assert picks.tolist() == [4]

    rng1, rng2 = np.random.default_rng(3), np.random.default_rng(3)
    prior = np.linspace(1, 2, 10)
    a = draw_queries(q, prior, 4, rng1, replacement=False)
    prod = q * prior
    b = sample_query_pmf(prod / prod.sum(), 4, rng2, replacement=False)
    np.testing.assert_array_equal(a, b)

    # no prior: identical to the plain PMF draw
    rng1, rng2 = np.random.default_rng(5), np.random.default_rng(5)
    np.testing.assert_array_equal(
        draw_queries(q, None, 3, rng1),
        sample_query_pmf(q, 3, rng2, replacement=False))
