"""Lanczos eigensolver + Arnoldi low-rank influence (Schioppa et al.,
arXiv:2112.03052) and the one-sweep jvp influence scorer, vs explicit
oracles on a tiny net."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import CNNSpec, Layer
from nnal_tpu.scoring.hessian import arnoldi_s_test, lanczos_eigsh
from nnal_tpu.scoring.influence import (
    _chunk_influence,
    influence_scores,
    make_loss,
    s_test,
)


def tiny_spec():
    layers = (
        Layer("conv1", "conv", 4, (3, 3), (1, 1)),
        Layer("max1", "pool", None, (2, 2), (2, 2)),
        Layer("fc1", "fc", 8),
        Layer("fc2", "fc", 2),
    )
    return CNNSpec("tiny", layers, (6, 6, 1), 2, feature_layer=2)


def _setup(n=6, seed=0):
    spec = tiny_spec()
    params, _ = init_cnn(spec, jax.random.key(seed))
    x = jax.random.normal(jax.random.key(seed + 1), (n, 6, 6, 1))
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.key(seed + 2), (n,), 0, 2), 2)
    return spec, params, x, y


def _explicit_hessian(spec, params, x, y):
    flat, unravel = ravel_pytree(params)
    loss = make_loss(spec)

    def f(v):
        return loss(unravel(v), x, y)

    return np.asarray(jax.hessian(f)(flat)), np.asarray(flat), unravel


def test_influence_scores_jvp_matches_vmap_oracle():
    """One forward-mode sweep == per-sample vmap(grad) dots, including
    through the bucket-padding wrapper."""
    spec, params, x, y = _setup(n=5)
    st = s_test(spec, params, x, y, x, y, damping=0.1, bucket=8)
    oracle = np.asarray(_chunk_influence(spec, params, st, x, y))
    got = influence_scores(spec, params, st, x, y, bucket=8)
    np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=1e-7)


def test_lanczos_matches_explicit_top_eigenpairs():
    spec, params, x, y = _setup()
    H, _, _ = _explicit_hessian(spec, params, x, y)
    all_evals = np.linalg.eigvalsh(H)
    want = all_evals[np.argsort(-np.abs(all_evals))]
    evals, V, _ = lanczos_eigsh(spec, params, x, y, rank=30,
                                key=jax.random.key(3))
    got = np.asarray(evals)
    # extreme (largest-|.|) eigenvalues converge first in Lanczos
    np.testing.assert_allclose(got[:4], want[:4], rtol=1e-3, atol=1e-5)
    # Ritz vectors are orthonormal
    G = np.asarray(V @ V.T)
    np.testing.assert_allclose(G, np.eye(G.shape[0]), atol=1e-4)
    # and satisfy the eigen-residual ||Hv - lam v|| << |lam| for the top
    v0 = np.asarray(V[0])
    r = H @ v0 - got[0] * v0
    assert np.linalg.norm(r) < 1e-3 * max(abs(got[0]), 1e-6)


def test_arnoldi_projection_matches_numpy_oracle():
    """With an explicitly supplied eigenbasis the projection formula is
    deterministic: compare against the numpy transcription."""
    spec, params, x, y = _setup()
    H, _, unravel = _explicit_hessian(spec, params, x, y)
    damping = 0.3
    evals_np, vecs = np.linalg.eigh(H)
    order = np.argsort(-np.abs(evals_np))[:6]
    lam = evals_np[order]
    V = vecs[:, order].T                                   # (6, dim)

    g_tree = jax.grad(make_loss(spec))(params, x, y)
    g, _ = ravel_pytree(g_tree)
    g = np.asarray(g)
    want = (V.T @ ((V @ g) / (lam + damping))
            + (g - V.T @ (V @ g)) / damping)

    basis = (jnp.asarray(lam, jnp.float32), jnp.asarray(V, jnp.float32),
             unravel)
    got_tree, _ = arnoldi_s_test(spec, params, x, y, x, y, rank=6,
                                 key=jax.random.key(0), damping=damping,
                                 basis=basis)
    got, _ = ravel_pytree(got_tree)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                               atol=1e-6)


def test_arnoldi_s_test_approaches_direct_solve():
    """End-to-end (Lanczos basis built internally): the low-rank solve
    approaches the dense ``(H + damping)^{-1} g`` as rank grows.  The
    relative error of the complement's ``1/damping`` approximation is
    bounded by (largest uncaptured |eigenvalue|)/damping, so accuracy is
    a function of rank vs the spectrum tail — the assertion checks the
    convergence trend and a realistic absolute level, not magic."""
    spec, params, x, y = _setup()
    H, _, _ = _explicit_hessian(spec, params, x, y)
    damping = 5.0
    g_tree = jax.grad(make_loss(spec))(params, x, y)
    g, _ = ravel_pytree(g_tree)
    g = np.asarray(g)
    exact = np.linalg.solve(H + damping * np.eye(H.shape[0]), g)

    errs = {}
    for rank in (2, 32):
        st_tree, _ = arnoldi_s_test(spec, params, x, y, x, y, rank=rank,
                                    key=jax.random.key(1),
                                    damping=damping)
        st, _ = ravel_pytree(st_tree)
        errs[rank] = (np.linalg.norm(np.asarray(st) - exact)
                      / np.linalg.norm(exact))
    assert errs[32] < 0.25
    assert errs[32] < errs[2]


def test_near_singular_eigenvalue_is_annihilated():
    """The CE Hessian is indefinite: a Ritz eigenvalue near -damping must
    not blow the solve up — the mode is dropped (zeroed), not inverted."""
    spec, params, x, y = _setup()
    H, _, unravel = _explicit_hessian(spec, params, x, y)
    damping = 0.3
    evals_np, vecs = np.linalg.eigh(H)
    order = np.argsort(-np.abs(evals_np))[:4]
    lam = evals_np[order].astype(np.float32)
    V = vecs[:, order].T.astype(np.float32)
    lam[2] = -damping                    # exactly singular direction
    lam[3] = -damping * 1.05             # inside the 10% floor

    basis = (jnp.asarray(lam), jnp.asarray(V), unravel)
    st_tree, _ = arnoldi_s_test(spec, params, x, y, x, y, rank=4,
                                key=jax.random.key(0), damping=damping,
                                basis=basis)
    st, _ = ravel_pytree(st_tree)
    st = np.asarray(st)
    assert np.isfinite(st).all()

    g_tree = jax.grad(make_loss(spec))(params, x, y)
    g, _ = ravel_pytree(g_tree)
    g = np.asarray(g)
    with np.errstate(divide="ignore"):
        inv = np.where(np.abs(lam + damping) < 0.1 * damping, 0.0,
                       1.0 / (lam + damping))
    want = V.T @ ((V @ g) * inv) + (g - V.T @ (V @ g)) / damping
    np.testing.assert_allclose(st, want, rtol=2e-4, atol=1e-6)


def test_unknown_influence_mode_raises():
    from nnal_tpu.scoring.strategies import _s_test_dispatch

    spec, params, x, y = _setup()
    with pytest.raises(ValueError, match="influence_mode"):
        _s_test_dispatch({"influence_mode": "arnodli"}, spec, params,
                         x, y, 0.1, x.shape[0], jax.random.key(0))


def test_basis_reuse_is_deterministic():
    """Passing the returned basis back reproduces the same s_test without
    re-running Lanczos (the cross-round amortization contract)."""
    spec, params, x, y = _setup()
    s1, basis = arnoldi_s_test(spec, params, x, y, x, y, rank=5,
                               key=jax.random.key(2), damping=0.5)
    s2, _ = arnoldi_s_test(spec, params, x, y, x, y, rank=5,
                           key=jax.random.key(9), damping=0.5,
                           basis=basis)
    f1, _ = ravel_pytree(s1)
    f2, _ = ravel_pytree(s2)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


@pytest.mark.slow
def test_influence_arnoldi_mode_e2e(tmp_path):
    """Config-driven: influence querying with influence_mode=arnoldi runs a
    campaign through the engine."""
    from nnal_tpu.cli.expr_handler import do_expr

    overrides = ("patch_shape=[9,9,1],grid_spacing=4,k=4,B=20,ntb=256,"
                 "b=32,epochs=1,MC_iters=2,init_size=8,"
                 "learning_rate=1e-3,optimizer_name=Adam,"
                 "influence_mode=arnoldi,arnoldi_rank=4,"
                 "synthetic_shape=[24,24,8],synthetic_blobs=6")
    res = do_expr(str(tmp_path / "arn"), "influence", 8, overrides,
                  synthetic=True)
    assert res["n_queries"] == 8
    assert np.isfinite(res["perf"]).all()
