"""Full-stack rank parity vs a pure-NumPy PW1 forward oracle.

SURVEY.md hard part #1: query *rankings* on fixed weights must match a
NumPy transcription of the reference forward math bit-for-rank.  This
oracle implements conv (SAME) / max-pool (2x2 s2) / feature-major FC /
softmax with float64 NumPy loops, shares weights with the JAX model, and
asserts the entropy-query top-B selection is identical.
"""

import jax
import numpy as np
import pytest

from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.scoring.uncertainty import binary_uncertainty_filter


def _np_conv_same(h, W, b):
    """h: (n, H, W, Cin); W: (k1, k2, Cin, Cout) -> SAME conv + bias
    (the spec's conv padding; odd kernels, stride 1)."""
    n, H, Wd, Ci = h.shape
    k1, k2, _, Co = W.shape
    p1, p2 = (k1 - 1) // 2, (k2 - 1) // 2
    hp = np.pad(h, ((0, 0), (p1, p1), (p2, p2), (0, 0)))
    out = np.zeros((n, H, Wd, Co))
    for i in range(H):
        for j in range(Wd):
            win = hp[:, i:i + k1, j:j + k2, :]          # (n, k1, k2, Ci)
            out[:, i, j, :] = np.tensordot(win, W,
                                           axes=([1, 2, 3], [0, 1, 2]))
    return out + b


def _np_maxpool2(h):
    """2x2 stride-2 max pool; even spatial dims make SAME == VALID."""
    n, H, W, C = h.shape
    assert H % 2 == 0 and W % 2 == 0
    return h.reshape(n, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


def _np_forward_pw1(params, x):
    """NumPy PW1: conv1-conv2-pool-conv3-conv4-pool-fc1-fc2-fc3."""
    h = x.astype(np.float64)
    relu = lambda a: np.maximum(a, 0.0)
    h = relu(_np_conv_same(h, np.asarray(params["conv1"]["W"], np.float64),
                            np.asarray(params["conv1"]["b"], np.float64)))
    h = relu(_np_conv_same(h, np.asarray(params["conv2"]["W"], np.float64),
                            np.asarray(params["conv2"]["b"], np.float64)))
    h = _np_maxpool2(h)
    h = relu(_np_conv_same(h, np.asarray(params["conv3"]["W"], np.float64),
                            np.asarray(params["conv3"]["b"], np.float64)))
    h = relu(_np_conv_same(h, np.asarray(params["conv4"]["W"], np.float64),
                            np.asarray(params["conv4"]["b"], np.float64)))
    h = _np_maxpool2(h)
    h = h.reshape(h.shape[0], -1)
    for name in ("fc1", "fc2"):
        W = np.asarray(params[name]["W"], np.float64)
        b = np.asarray(params[name]["b"], np.float64)
        h = relu(h @ W + b)
    W = np.asarray(params["fc3"]["W"], np.float64)
    b = np.asarray(params["fc3"]["b"], np.float64)
    logits = h @ W + b
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


@pytest.fixture(scope="module")
def model():
    spec = create_pw1(2, 0.0, (12, 12, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    return spec, params


def test_posteriors_match_numpy_oracle(model):
    spec, params = model
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 12, 12, 1)).astype(np.float32)
    ours = np.asarray(apply_cnn(spec, params, x).posteriors)
    oracle = _np_forward_pw1(params, x)
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-5)


def test_entropy_query_rank_parity(model):
    """Top-B most-uncertain selection == the NumPy oracle's, with the
    documented stable-sort tie-break (BASELINE: bit-for-rank)."""
    spec, params = model
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 12, 12, 1)).astype(np.float32)
    p1 = np.asarray(apply_cnn(spec, params, x).posteriors)[:, 1]
    p1_oracle = _np_forward_pw1(params, x)[:, 1]
    B = 16
    sel = np.asarray(binary_uncertainty_filter(p1, B))
    sel_oracle = np.argsort(np.abs(p1_oracle - 0.5), kind="stable")[:B]
    np.testing.assert_array_equal(np.sort(sel), np.sort(sel_oracle))
    # order parity too (not just set membership)
    np.testing.assert_array_equal(sel, sel_oracle)
