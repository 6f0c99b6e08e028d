"""Regression tests for the round-3 scoring-layer review findings.

Each test pins a bug found by the adversarial code-review pass:
CG zero-return on small gradients / first-iteration negative curvature,
the multi-subject fi path dropping the lambda representativeness term,
even-d3 sweep AttributeError, NaN feature normalization, and the PMF
clamp-after-unique duplicate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model


def _tree_flat(t):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(t)])


def test_cg_relative_tolerance_scales_linearly():
    """(H + damping)^-1 is linear, so cg(c * v) == c * cg(v).  The old
    ABSOLUTE stopping threshold (rs > 1e-6) never entered the loop for a
    small-norm v, returning the zero vector and violating linearity."""
    from nnal_tpu.data.batching import make_onehot
    from nnal_tpu.scoring.influence import cg_solve_hvp, loss_grad

    spec = create_model("PW", nclass=2, dropout_rate=0.0,
                        patch_shape=(9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 9, 9, 1)).astype(np.float32))
    y = jnp.asarray(make_onehot(rng.integers(0, 2, 8), 2))
    v = loss_grad(spec, params, x, y)
    c = 1e-5
    v_small = jax.tree_util.tree_map(lambda a: c * a, v)
    t_big = _tree_flat(cg_solve_hvp(spec, params, x, y, v,
                                    damping=0.1, max_iter=20))
    t_small = _tree_flat(cg_solve_hvp(spec, params, x, y, v_small,
                                      damping=0.1, max_iter=20))
    assert np.linalg.norm(t_small) > 0, "small-norm v returned zero s_test"
    # f32 accumulation noise: allow a tiny absolute floor relative to the
    # solution's own magnitude
    np.testing.assert_allclose(t_small, c * t_big, rtol=1e-3,
                               atol=1e-4 * c * np.abs(t_big).max())


def test_multimg_fi_lambda_changes_selection():
    """lambda_>0 must activate the representativeness objective on the
    multi-subject fi path too (it silently passed X_pool=None before), and
    a 1-subject multimg run must still match the single-subject path."""
    from nnal_tpu.data.samplers import generate_grid_samples
    from nnal_tpu.scoring.pool_eval import PoolEvaluator
    from nnal_tpu.scoring.strategies import (
        QueryContext,
        cnn_query,
        query_multimg,
    )

    vols, mask = synthetic_subject(shape=(20, 20, 6), n_modalities=1,
                                   seed=4)
    spec = create_model("PW", nclass=2, dropout_rate=0.0,
                        patch_shape=(9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    ev = PoolEvaluator.from_volumes(spec, vols, [[0.0, 1.0]], (9, 9, 1),
                                    ntb=256)
    inds, _ = generate_grid_samples(np.asarray(vols[0]).shape, 5, mask)

    def ctx(seed, lam):
        return QueryContext(spec=spec, params=params, evaluator=ev,
                            pool_inds=inds, k=4,
                            rng=np.random.default_rng(seed),
                            jax_rng=jax.random.key(1), B=12, lambda_=lam)

    # single- vs multi-path parity at lambda > 0 (both use the composite
    # SDP branch and the same refined features)
    q_single = cnn_query(ctx(11, 0.5), "fi")
    q_multi = query_multimg([ctx(11, 0.5)], "fi", 4,
                            np.random.default_rng(11))
    assert np.array_equal(q_single, q_multi[0])
    # and lambda must actually change the optimal PMF's support/draws
    # (identical rng streams; only the objective differs — a large lambda
    # makes the representativeness term dominate, which was a silent
    # no-op on the multi path before)
    q_lam0 = query_multimg([ctx(11, 0.0)], "fi", 4,
                           np.random.default_rng(11))
    q_lam50 = query_multimg([ctx(11, 50.0)], "fi", 4,
                            np.random.default_rng(11))
    assert not np.array_equal(q_lam50[0], q_lam0[0])


def test_even_d3_sweep_raises_clear_error():
    """fim_sweep/perturb_sweep on an even-d3 evaluator raised
    AttributeError (_slices never assigned); now a ValueError that names
    the reason.  evaluate() keeps delegating to the exact gather."""
    from nnal_tpu.data.patches import pad_volumes
    from nnal_tpu.data.samplers import generate_grid_samples
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    vols, mask = synthetic_subject(shape=(16, 16, 6), n_modalities=1,
                                   seed=0)
    patch_shape = (9, 9, 2)
    spec = create_model("PW", nclass=2, dropout_rate=0.0,
                        patch_shape=(9, 9, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    ev = GridPoolEvaluator(spec, pad_volumes(vols, patch_shape), mu, sd,
                           patch_shape, (16, 16, 6), grid_spacing=4)
    with pytest.raises(ValueError, match="even"):
        ev.fim_sweep(params)
    with pytest.raises(ValueError, match="even"):
        ev.perturb_sweep(params, jax.random.key(1))
    inds, _ = generate_grid_samples((16, 16, 6), 4, mask)
    p1 = np.asarray(ev.evaluate(params, inds)["posteriors"])
    assert p1.shape == (len(inds),) and np.isfinite(p1).all()


def test_zero_feature_rows_do_not_nan():
    """A zero feature row (post-ReLU vectors can be exactly zero under a
    one-class-regime model) must not produce NaNs that silently corrupt
    the greedy selections (NaN comparisons are false on XLA)."""
    from nnal_tpu.scoring.representative import (
        core_set_select,
        cosine_similarity,
        normalize_rows,
        rep_entropy_select,
    )

    F = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
    F[2] = 0.0
    S = np.asarray(cosine_similarity(jnp.asarray(F), jnp.asarray(F)))
    assert np.isfinite(S).all()
    Fn = np.asarray(normalize_rows(jnp.asarray(F)))
    assert np.isfinite(Fn).all() and np.allclose(Fn[2], 0.0)
    chosen = np.asarray(rep_entropy_select(jnp.asarray(S[:, :3]), 2))
    assert len(set(chosen.tolist())) == 2
    picks = np.asarray(core_set_select(
        jnp.asarray(Fn), jnp.full((6,), -jnp.inf), 3))
    assert len(set(picks.tolist())) == 3


def test_pmf_out_of_range_draw_stays_unique():
    """A draw past cumsum[-1] (float rounding) maps to len(q); clamping
    after np.unique could emit len(q)-1 twice."""
    from nnal_tpu.scoring.pmf import sample_query_pmf

    class StubRng:
        def random(self, k):
            # first draw beyond any float64 cumsum, second in the last bin
            return np.array([1.0, 0.75])[:k]

    q = np.array([0.5, 0.5]) * (1 - 1e-12)
    out = sample_query_pmf(q, 2, StubRng(), replacement=True)
    assert len(out) == len(np.unique(out)), out
    assert out.tolist() == [1]


def test_bucket_padded_selection_parity():
    """Bucket-padding (shape-stability rule) must be rank-exact: padded
    rep-entropy and core-set selections equal the unpadded oracles."""
    from nnal_tpu.scoring.representative import (
        core_set_select,
        cosine_similarity,
        cross_max_similarities,
        normalize_rows,
        pad_rows,
        rep_entropy_from_features,
        rep_entropy_select,
    )

    rng = np.random.default_rng(5)
    F = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    sel = rng.permutation(300)[:24]
    rest = np.setdiff1d(np.arange(300), sel)

    sims_o = cosine_similarity(F[jnp.asarray(rest)], F[jnp.asarray(sel)])
    chosen_o = np.asarray(rep_entropy_select(sims_o, 6))
    chosen_p = rep_entropy_from_features(F, rest, sel, 6)
    assert np.array_equal(chosen_o, chosen_p)

    F_t = jnp.asarray(rng.normal(size=(17, 16)).astype(np.float32))
    sims0_o = jnp.asarray(cross_max_similarities(F, F_t, as_device=True))
    pick_o = np.asarray(core_set_select(normalize_rows(F), sims0_o, 5))
    F_p, n_u = pad_rows(F, 128)
    sims0_p = jnp.asarray(cross_max_similarities(
        F_p, F_t, as_device=True, keep_pad=True, tile=128))
    sims0_p = jnp.where(jnp.arange(F_p.shape[0]) < n_u, sims0_p, jnp.inf)
    pick_p = np.asarray(core_set_select(normalize_rows(F_p), sims0_p, 5))
    assert np.array_equal(pick_o, pick_p)
    # repeat-padding the reduced-over side never changes a max
    np.testing.assert_array_equal(
        np.asarray(cross_max_similarities(F, F_t[:1])),
        np.asarray(cross_max_similarities(F, jnp.tile(F_t[:1], (7, 1)))))
