"""Second-order machinery vs autodiff oracles (SURVEY.md §4 item 1):
shrunk gradients (epsilon trick) vs explicit per-param grads, diagonal
Fisher vs per-sample grad^2, LLFC closed forms vs autodiff, HVP vs explicit
Hessian, CG solve, LiSSA, A-matrices."""

import jax
from jax.flatten_util import ravel_pytree
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.specs import create_pw1, CNNSpec, Layer
from nnal_tpu.scoring.fisher import a_matrices
from nnal_tpu.scoring.gradients import (
    diagonal_fisher,
    grad_param_layers,
    layer_sizes,
    per_sample_grads,
    shrunk_class_grads,
)
from nnal_tpu.scoring.hessian import lissa_influence, llfc_grads, llfc_hess
from nnal_tpu.scoring.influence import (
    cg_solve_hvp,
    hvp,
    loss_grad,
    make_loss,
)


def tiny_spec():
    layers = (
        Layer("conv1", "conv", 4, (3, 3), (1, 1)),
        Layer("max1", "pool", None, (2, 2), (2, 2)),
        Layer("fc1", "fc", 8),
        Layer("fc2", "fc", 2),
    )
    return CNNSpec("tiny", layers, (6, 6, 1), 2, feature_layer=2)


def test_fast_shrunk_grads_match_persample():
    from nnal_tpu.scoring.gradients import shrunk_class_grads_persample

    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 6, 6, 1))
    fast = np.asarray(shrunk_class_grads(spec, params, x))
    oracle = np.asarray(shrunk_class_grads_persample(spec, params, x))
    np.testing.assert_allclose(fast, oracle, rtol=2e-3, atol=1e-6)


def test_shrunk_grads_match_explicit():
    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (3, 6, 6, 1))

    shrunk = np.asarray(shrunk_class_grads(spec, params, x))  # (3, 2, L)
    names = grad_param_layers(spec, params)
    sizes = layer_sizes(spec, params)

    # oracle: full per-param gradient of log p_c, summed per layer
    def logp(p, xi, c):
        out = apply_cnn(spec, p, xi[None])
        return jax.nn.log_softmax(out.logits, axis=-1)[0, c]

    for i in range(3):
        for c in range(2):
            g = jax.grad(logp)(params, x[i], c)
            for j, n in enumerate(names):
                expect = (np.asarray(g[n]["W"]).sum()
                          + np.asarray(g[n]["b"]).sum()) / sizes[j]
                assert np.isclose(shrunk[i, c, j], expect,
                                  rtol=1e-4, atol=1e-6), (i, c, n)


def test_diagonal_fisher_matches_per_sample():
    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (5, 6, 6, 1))
    y = jnp.asarray(np.eye(2)[[0, 1, 0, 1, 0]], jnp.float32)
    dF = diagonal_fisher(spec, params, x, y, chunk=2)
    g = per_sample_grads(spec, params, x, y)
    expect = jax.tree_util.tree_map(lambda a: np.mean(np.asarray(a) ** 2,
                                                      axis=0), g)
    np.testing.assert_allclose(np.asarray(dF["fc2"]["W"]),
                               expect["fc2"]["W"], rtol=1e-4, atol=1e-7)


def test_llfc_closed_forms_vs_autodiff():
    rng = np.random.default_rng(0)
    d, c, b = 5, 3, 4
    a = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(d, c)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    y = jnp.asarray(np.eye(c)[rng.integers(0, c, b)], jnp.float32)

    def loss(Wb, ai, yi):
        W_, b_ = Wb
        z = ai @ W_ + b_
        return -jnp.sum(yi * jax.nn.log_softmax(z))

    p = jax.nn.softmax(a @ W + bias, axis=-1)
    dW, db = llfc_grads(a, p, y)
    for i in range(b):
        gW, gb = jax.grad(loss)((W, bias), a[i], y[i])
        np.testing.assert_allclose(np.asarray(dW[i]), np.asarray(gW),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(db[i]), np.asarray(gb),
                                   rtol=1e-4, atol=1e-5)

    # Hessian: compare against autodiff over theta = [W rows..., b]
    H = llfc_hess(a, p)
    i = 1

    def loss_flat(theta, ai, yi):
        W_ = theta[:d * c].reshape(d, c)
        b_ = theta[d * c:]
        z = ai @ W_ + b_
        return -jnp.sum(yi * jax.nn.log_softmax(z))

    theta = jnp.concatenate([W.reshape(-1), bias])
    H_auto = jax.hessian(loss_flat)(theta, a[i], y[i])
    np.testing.assert_allclose(np.asarray(H[i]), np.asarray(H_auto),
                               rtol=1e-3, atol=1e-4)


def test_hvp_matches_explicit_hessian():
    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 6, 6, 1))
    y = jnp.asarray(np.eye(2)[[0, 1, 1, 0]], jnp.float32)

    flat, unravel = ravel_pytree(params)
    loss = make_loss(spec)

    def loss_flat(t):
        return loss(unravel(t), x, y)

    v_flat = jax.random.normal(jax.random.key(2), flat.shape)
    v = unravel(v_flat)
    Hv = hvp(spec, params, x, y, v)
    Hv_flat, _ = ravel_pytree(Hv)
    H = jax.hessian(loss_flat)(flat)
    np.testing.assert_allclose(np.asarray(Hv_flat), np.asarray(H @ v_flat),
                               rtol=1e-3, atol=1e-4)


def test_cg_solves_hvp_system():
    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (6, 6, 6, 1))
    y = jnp.asarray(np.eye(2)[np.arange(6) % 2], jnp.float32)
    v = loss_grad(spec, params, x, y)
    # damping must exceed |lambda_min| of the (indefinite) CE Hessian for
    # the damped system to be PD; this net's spectrum is [-1.86, 35.4]
    damping = 2.5
    t = cg_solve_hvp(spec, params, x, y, v, damping=damping, max_iter=100)
    Ht = hvp(spec, params, x, y, t)
    resid = jax.tree_util.tree_map(lambda h, ti, vi: h + damping * ti - vi,
                                   Ht, t, v)
    r_flat, _ = ravel_pytree(resid)
    v_flat, _ = ravel_pytree(v)
    assert np.linalg.norm(np.asarray(r_flat)) < 1e-2 * max(
        1.0, np.linalg.norm(np.asarray(v_flat)))


def test_a_matrices_semantics():
    shrunk = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2, 3)),
                         jnp.float32)
    p = jnp.asarray([0.5, 0.0, 1.0, 1e-7], jnp.float32)
    A = np.asarray(a_matrices(shrunk, p, diag_load=1e-5))
    g0 = np.asarray(shrunk[:, 0, :])
    g1 = np.asarray(shrunk[:, 1, :])
    # p=0.5 mixes both
    exp0 = 0.5 * np.outer(g0[0], g0[0]) + 0.5 * np.outer(g1[0], g1[0]) \
        + 1e-5 * np.eye(3)
    np.testing.assert_allclose(A[0], exp0, rtol=1e-5, atol=1e-7)
    # p below 1e-6 snaps to 0: only g0 contributes
    exp1 = np.outer(g0[1], g0[1]) + 1e-5 * np.eye(3)
    np.testing.assert_allclose(A[1], exp1, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(A[3], np.outer(g0[3], g0[3])
                               + 1e-5 * np.eye(3), rtol=1e-5, atol=1e-7)
    # p=1: only g1
    exp2 = np.outer(g1[2], g1[2]) + 1e-5 * np.eye(3)
    np.testing.assert_allclose(A[2], exp2, rtol=1e-5, atol=1e-7)


def test_lissa_converges_on_quadratic():
    rng = np.random.default_rng(0)
    D = 6
    M = rng.normal(size=(D, D))
    H = M @ M.T / D + np.eye(D)
    g = rng.normal(size=(D, 1))
    scale = 10.0
    hess = jnp.asarray(np.repeat(H[None], 3, axis=0), jnp.float32)
    V = lissa_influence(jnp.asarray(g, jnp.float32), hess,
                        max_iter=400, scale=scale)
    # V approximates scale * H^{-1} g when iteration converges
    expect = scale * np.linalg.solve(H, g)
    np.testing.assert_allclose(np.asarray(V), expect, rtol=0.05, atol=0.05)


def test_s_test_padding_is_exact_noop():
    """Bucket-padding the labeled set must not move influence rankings:
    with the validity mask on BOTH the Hessian and the query gradient
    (q_n_valid), padded rows are exact no-ops and s_test matches the
    unpadded solve bit-for-rank (advisor r2 high finding: an unweighted
    mean over the padded query batch let the fake rows dominate v)."""
    from nnal_tpu.scoring.influence import influence_scores, s_test

    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    rng = np.random.default_rng(3)
    n_tr = 5
    tr_x = jnp.asarray(rng.normal(size=(n_tr, 6, 6, 1)), jnp.float32)
    tr_y = jnp.asarray(np.eye(2)[rng.integers(0, 2, n_tr)], jnp.float32)

    # oracle: no padding at all (bucket divides n exactly, q unweighted)
    st_ref = s_test(spec, params, tr_x, tr_y, tr_x, tr_y,
                    damping=0.1, bucket=5)

    # production path: caller pre-pads with junk rows (nonzero patches,
    # wrong labels) exactly like strategies._influence does
    pad = 11
    junk_x = jnp.asarray(rng.normal(size=(pad, 6, 6, 1)), jnp.float32)
    junk_y = jnp.asarray(np.eye(2)[np.zeros(pad, np.int64)], jnp.float32)
    tx = jnp.concatenate([tr_x, junk_x])
    ty = jnp.concatenate([tr_y, junk_y])
    st_pad = s_test(spec, params, tx, ty, tx, ty, damping=0.1,
                    bucket=8, n_valid=n_tr, q_n_valid=n_tr)

    pool_x = jnp.asarray(rng.normal(size=(7, 6, 6, 1)), jnp.float32)
    pool_y = jnp.asarray(np.eye(2)[rng.integers(0, 2, 7)], jnp.float32)
    sc_ref = influence_scores(spec, params, st_ref, pool_x, pool_y)
    sc_pad = influence_scores(spec, params, st_pad, pool_x, pool_y)
    np.testing.assert_allclose(sc_pad, sc_ref, rtol=1e-4, atol=1e-6)
    assert np.array_equal(np.argsort(-np.abs(sc_pad), kind="stable"),
                          np.argsort(-np.abs(sc_ref), kind="stable"))


def test_remat_shrunk_grads_match_plain():
    """jax.checkpoint segmenting of the epsilon-injection pass recomputes
    the same ops — gradients must match the non-remat path (the remat
    exists to fit larger scoring chunks in HBM, not to change math)."""
    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 6, 6, 1))
    plain = np.asarray(shrunk_class_grads(spec, params, x))
    remat = np.asarray(shrunk_class_grads(spec, params, x, remat=True))
    np.testing.assert_allclose(remat, plain, rtol=1e-6, atol=1e-8)
