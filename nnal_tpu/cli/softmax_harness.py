"""Softmax-regression AL comparison harness.

Rebuild of the reference's MNIST harness (``NNAL.test_MNIST`` +
NNAL_tools.py:116-360): compare FI / random / entropy querying on a linear
softmax model.  MNIST itself is not downloadable in this zero-egress image,
so the harness runs on a synthetic MNIST-like dataset by default (Gaussian
class clusters in pixel space) or any ``(X, y)`` npz the user points it at.
The FI score uses the closed form ``(||x||^2 + 1)(1 - ||p||^2)``
(NNAL_tools FI-based querying for linear softmax).
"""

from __future__ import annotations

import sys
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.scoring.cls_strategies import linear_softmax_fi_scores
from nnal_tpu.scoring.uncertainty import shannon_entropy


def synthetic_mnist(n_per_class: int = 200, nclass: int = 10, d: int = 64,
                    seed: int = 0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(nclass, d)) * 2.0
    X = np.concatenate([centers[c] + rng.normal(size=(n_per_class, d))
                        for c in range(nclass)]).astype(np.float32)
    y = np.repeat(np.arange(nclass), n_per_class)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


@jax.jit
def _softmax_train(W, b, X, Y, lr, steps):
    def step(i, carry):
        W, b = carry
        logits = X @ W + b
        p = jax.nn.softmax(logits, axis=-1)
        g = (p - Y) / X.shape[0]
        return W - lr * X.T @ g, b - lr * g.sum(0)

    return jax.lax.fori_loop(0, steps, step, (W, b))


def run_comparison(X, y, nclass: int, *, k: int = 10, rounds: int = 10,
                   init_size: int = 20, test_ratio: float = 0.3,
                   seed: int = 0, lr: float = 0.5,
                   steps: int = 200) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    n = len(y)
    perm = rng.permutation(n)
    n_test = int(test_ratio * n)
    test, rest = perm[:n_test], perm[n_test:]
    Y = np.eye(nclass, dtype=np.float32)[y]

    curves = {}
    for method in ("random", "entropy", "fi"):
        m_rng = np.random.default_rng(seed + 1)
        train = rest[:init_size].copy()
        pool = rest[init_size:].copy()
        accs = []
        for _ in range(rounds):
            W = jnp.zeros((X.shape[1], nclass))
            b = jnp.zeros((nclass,))
            W, b = _softmax_train(W, b, jnp.asarray(X[train]),
                                  jnp.asarray(Y[train]), lr, steps)
            posts = np.asarray(jax.nn.softmax(
                jnp.asarray(X[pool]) @ W + b, axis=-1))
            if method == "random":
                q = m_rng.permutation(len(pool))[:k]
            elif method == "entropy":
                ent = np.asarray(shannon_entropy(jnp.asarray(posts)))
                q = np.argsort(-ent, kind="stable")[:k]
            else:
                fi = np.asarray(linear_softmax_fi_scores(
                    jnp.asarray(X[pool]), jnp.asarray(posts)))
                q = np.argsort(-fi, kind="stable")[:k]
            train = np.concatenate([train, pool[q]])
            pool = np.delete(pool, q)
            preds = np.asarray(jnp.argmax(
                jnp.asarray(X[test]) @ W + b, axis=-1))
            accs.append(float((preds == y[test]).mean()))
        curves[method] = np.asarray(accs)
    return curves


def main(argv=None):
    from nnal_tpu.core.platform import honor_env_platforms

    honor_env_platforms()
    X, y = synthetic_mnist()
    curves = run_comparison(X, y, 10)
    for m, c in curves.items():
        print(m, " ".join(f"{v:.3f}" for v in c))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
