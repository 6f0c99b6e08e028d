"""int8 post-training quantization (models/quant.py) — a rebuild-native
serving feature (no reference counterpart; the reference's serving is
float-only ``full_slice_segment``, eval_utils.py:104-200)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.models.cnn import apply_cnn, cast_float_params, init_cnn
from nnal_tpu.models.quant import is_quantized, quantize_params
from nnal_tpu.models.specs import create_model


@pytest.fixture(scope="module")
def pw_model():
    spec = create_model("PW", nclass=2, patch_shape=(9, 9, 1))
    params, _ = init_cnn(spec, jax.random.PRNGKey(0))
    return spec, params


def test_quantize_params_structure(pw_model):
    spec, params = pw_model
    qp = quantize_params(spec, params)
    assert is_quantized(qp) and not is_quantized(params)
    for name, p in qp.items():
        if "W_q" in p:
            assert p["W_q"].dtype == jnp.int8
            assert p["w_scale"].dtype == jnp.float32
            assert p["w_scale"].shape == (p["W_q"].shape[-1],)
            assert "W" not in p
            # dequantization error bounded by half a quantization step
            # (+ f32 slop: the divide/rint/multiply round-trip lands a few
            # ulps past 0.5, observed max 0.5000044)
            W = np.asarray(params[name]["W"], np.float32)
            deq = np.asarray(p["W_q"], np.float32) * np.asarray(p["w_scale"])
            assert np.max(np.abs(deq - W)
                          / np.asarray(p["w_scale"])) <= 0.5 + 1e-4
    # keep_float passthrough
    first_conv = next(l.name for l in spec.layers if l.kind == "conv")
    qp2 = quantize_params(spec, params, keep_float=[first_conv])
    assert "W" in qp2[first_conv] and "W_q" not in qp2[first_conv]


def test_int8_forward_close_to_float(pw_model):
    """Quantized posteriors track float posteriors; predictions mostly
    agree on random patches."""
    spec, params = pw_model
    qp = quantize_params(spec, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 9, 9, 1))
    ref = apply_cnn(spec, params, x)
    out = apply_cnn(spec, qp, x)
    p_ref = np.asarray(ref.posteriors)
    p_q = np.asarray(out.posteriors)
    assert p_q.shape == p_ref.shape and p_q.dtype == np.float32
    assert np.max(np.abs(p_q - p_ref)) < 0.25
    # judge agreement away from the decision boundary (near p=0.5 the
    # argmax flips on noise smaller than the quantization step)
    conf = np.abs(p_ref[:, 1] - 0.5) > 0.05
    agree = np.mean(np.asarray(out.prediction)[conf]
                    == np.asarray(ref.prediction)[conf]) if conf.any() else 1.0
    assert agree >= 0.9
    # int8 path also runs under a bf16 activation dtype
    out_bf = apply_cnn(spec, cast_float_params(qp, jnp.bfloat16),
                       x.astype(jnp.bfloat16))
    assert np.max(np.abs(np.asarray(out_bf.posteriors) - p_ref)) < 0.2


def test_cast_float_params_preserves_quant_leaves(pw_model):
    spec, params = pw_model
    qp = quantize_params(spec, params)
    cast = cast_float_params(qp, jnp.bfloat16)
    for name, p in cast.items():
        if "W_q" in p:
            assert p["W_q"].dtype == jnp.int8
            assert p["w_scale"].dtype == jnp.float32
            assert p["b"].dtype == jnp.bfloat16


def test_quantized_evaluator_sweep(pw_model):
    """PoolEvaluator / GridPoolEvaluator consume quantized pytrees
    unchanged; predictions mostly agree with the float sweep."""
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.data.patches import pad_volumes
    from nnal_tpu.data.samplers import generate_grid_samples
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    spec, params = pw_model
    qp = quantize_params(spec, params)
    vols, _ = synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=3,
                                n_blobs=8)
    padded = pad_volumes(vols, (9, 9, 1))
    mu = np.array([float(np.mean(vols[0]))])
    sd = np.array([float(np.std(vols[0])) + 1e-6])
    ev = GridPoolEvaluator(spec, padded, mu, sd, (9, 9, 1),
                           tuple(vols[0].shape), grid_spacing=3, ntb=256)
    inds = generate_grid_samples(tuple(vols[0].shape), 3)[:200]
    ref = ev.evaluate(params, inds, ("posteriors", "prediction"))
    out = ev.evaluate(qp, inds, ("posteriors", "prediction"))
    conf = np.abs(ref["posteriors"] - 0.5) > 0.05
    if conf.any():
        assert np.mean(out["prediction"][conf]
                       == ref["prediction"][conf]) >= 0.9
    assert np.max(np.abs(out["posteriors"] - ref["posteriors"])) < 0.25


def test_quantized_fcn_runs():
    """Tiramisu-style FCN (convT stays float, BN + skips intact) forwards
    under quantization."""
    from nnal_tpu.models.specs import create_tiramisu103

    spec = create_tiramisu103(2, (16, 16, 1), growth=2, depths=(2, 2))
    params, state = init_cnn(spec, jax.random.PRNGKey(2))
    qp = quantize_params(spec, params)
    kinds = {l.name: l.kind for l in spec.layers}
    for name, p in qp.items():
        if kinds.get(name) == "convT":
            assert "W" in p and "W_q" not in p
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    ref = apply_cnn(spec, params, x, state=state)
    out = apply_cnn(spec, qp, x, state=state)
    assert out.posteriors.shape == ref.posteriors.shape
    assert np.max(np.abs(np.asarray(out.posteriors)
                         - np.asarray(ref.posteriors))) < 0.3


def test_quantized_checkpoint_roundtrip(tmp_path):
    """Quantize once -> save -> load -> serve: the npz checkpoint
    preserves the int8 W_q / f32 w_scale leaves exactly, so a deployed
    model can persist its quantized form instead of re-quantizing at
    every process start."""
    from nnal_tpu.models.checkpoint import load_checkpoint, save_checkpoint

    spec = create_model("PW", nclass=2, patch_shape=(9, 9, 1))
    params, _ = init_cnn(spec, jax.random.PRNGKey(4))
    qp = quantize_params(spec, params)
    path = str(tmp_path / "quant.npz")
    save_checkpoint(path, qp)
    loaded, _, _, _ = load_checkpoint(path)
    for name, p in qp.items():
        for k, v in p.items():
            got = loaded[name][k]
            assert got.dtype == np.asarray(v).dtype, (name, k, got.dtype)
            np.testing.assert_array_equal(got, np.asarray(v))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 9, 9, 1))
    ref = apply_cnn(spec, qp, x)
    out = apply_cnn(spec, {n: {k: jnp.asarray(v) for k, v in p.items()}
                           for n, p in loaded.items()}, x)
    np.testing.assert_array_equal(np.asarray(ref.posteriors),
                                  np.asarray(out.posteriors))
