"""bf16 anchor checkpoints: storage codec + adoption bit-identity.

``ckpt_dtype=bfloat16`` halves the resume-point payload (the dominant
tunnel transfer, benchmarks/CAMPAIGNS_r03.json) by storing float32 leaves
as bf16 bit views.  Bit-identical crash-resume comes from ADOPTION: the
engines round their live state with ``round_trip_bf16`` immediately before
each full save, so disk decodes to exactly the values the uninterrupted
process keeps (engine.common.adopt_anchor_rounding).  These tests pin the
codec's exactness and the adoption equivalence; the engine-level
process-death variants live in tests/test_ckpt_every.py.
"""

import os

import numpy as np
import optax
import pytest

from nnal_tpu.models.checkpoint import (
    load_checkpoint,
    restore_opt_state,
    round_trip_bf16,
    save_checkpoint,
)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "conv1": {"W": rng.normal(size=(3, 3, 2, 8)).astype(np.float32),
                  "b": rng.normal(size=(8,)).astype(np.float32)},
        "fc": {"W": rng.normal(scale=1e-4, size=(32, 4)).astype(np.float32),
               "b": np.zeros(4, np.float32)},
    }


def test_bf16_roundtrip_is_exact_rounding(tmp_path):
    params = _tree()
    path = str(tmp_path / "w.npz")
    save_checkpoint(path, params, dtype="bfloat16")

    # stored representation: uint16 bit views under marked keys
    with np.load(path) as z:
        assert all(k.endswith("@bf16") for k in z.files), z.files
        assert all(z[k].dtype == np.uint16 for k in z.files)

    loaded, _, _, _ = load_checkpoint(path)
    rounded = round_trip_bf16(params)
    for k in ("conv1", "fc"):
        for p in ("W", "b"):
            got = loaded[k][p]
            assert got.dtype == np.float32
            np.testing.assert_array_equal(got, np.asarray(rounded[k][p]))
            # rounding is real but small (bf16 has 8 mantissa bits)
            assert np.all(np.abs(got - params[k][p])
                          <= np.abs(params[k][p]) * 2 ** -8 + 1e-38)


def test_bf16_preserves_tiny_adam_moments(tmp_path):
    # float16 would flush ~1e-8 second moments to denormals/zero; bf16
    # keeps f32's exponent range — the reason the anchor dtype is bf16.
    # restore_opt_state only needs a same-structure pytree, so a plain
    # dict stands in for the optax state here.
    params = {"l": {"W": np.zeros((4, 4), np.float32)}}
    opt = {"mu": {"l": {"W": np.full((4, 4), -2e-7, np.float32)}},
           "nu": {"l": {"W": np.full((4, 4), 3e-9, np.float32)}}}
    path = str(tmp_path / "w.npz")
    save_checkpoint(path, params, opt_state=opt, dtype="bfloat16")
    template = {"mu": {"l": {"W": np.zeros((4, 4), np.float32)}},
                "nu": {"l": {"W": np.zeros((4, 4), np.float32)}}}
    restored = restore_opt_state(path, template)
    assert np.all(np.asarray(restored["nu"]["l"]["W"]) > 1e-9)
    assert np.all(np.asarray(restored["mu"]["l"]["W"]) < -1e-7)


def test_opt_state_bf16_roundtrip_matches_adoption(tmp_path):
    import jax

    params = _tree(1)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    # run a couple of real updates so the moments are nontrivial
    for i in range(3):
        grads = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32), _tree(10 + i))
        updates, opt = tx.update(grads, opt)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "w.npz")
    save_checkpoint(path, params, opt_state=opt, dtype="bfloat16")
    restored = restore_opt_state(path, tx.init(params))

    want = jax.tree_util.tree_leaves(round_trip_bf16(opt))
    got = jax.tree_util.tree_leaves(restored)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w, np.float32),
                                      np.asarray(g, np.float32))


def test_bf16_file_is_half_the_bytes(tmp_path):
    params = {"fc": {"W": np.random.default_rng(0).normal(
        size=(256, 256)).astype(np.float32)}}
    p32 = str(tmp_path / "f32.npz")
    p16 = str(tmp_path / "bf16.npz")
    save_checkpoint(p32, params)
    save_checkpoint(p16, params, dtype="bfloat16")
    assert os.path.getsize(p16) < 0.55 * os.path.getsize(p32)


def test_plain_f32_checkpoints_unchanged(tmp_path):
    params = _tree(2)
    path = str(tmp_path / "w.npz")
    save_checkpoint(path, params)
    with np.load(path) as z:
        assert not any(k.endswith("@bf16") for k in z.files)
    loaded, _, _, _ = load_checkpoint(path)
    np.testing.assert_array_equal(loaded["conv1"]["W"], params["conv1"]["W"])


def test_bad_dtype_rejected(tmp_path):
    with pytest.raises(ValueError):
        save_checkpoint(str(tmp_path / "w.npz"), _tree(), dtype="float16")


def test_int8_roundtrip_matches_adoption(tmp_path):
    """int8 anchors: the on-disk decode must equal round_trip_int8's
    adopted values EXACTLY (same deterministic encode on the same
    pre-adoption tensors; decode is the identical IEEE f32 multiply)."""
    from nnal_tpu.models.checkpoint import round_trip_int8

    params = _tree(3)
    path = str(tmp_path / "w.npz")
    save_checkpoint(path, params, dtype="int8")
    with np.load(path) as z:
        assert any(k.endswith("@i8") for k in z.files), z.files
        assert any(k.endswith("@i8s") for k in z.files)
        # biases (1-D) take the bf16 path
        assert any(k.endswith("@bf16") for k in z.files)
    loaded, _, _, _ = load_checkpoint(path)
    adopted = round_trip_int8(params)
    for k in ("conv1", "fc"):
        for p in ("W", "b"):
            np.testing.assert_array_equal(
                loaded[k][p], np.asarray(adopted[k][p]),
                err_msg=f"{k}/{p}")
    # quantization error bounded by half a step per out-slice
    W = params["conv1"]["W"]
    step = np.max(np.abs(W.reshape(-1, W.shape[-1])), axis=0) / 127.0
    assert np.all(np.abs(loaded["conv1"]["W"] - W) <= step * 0.5 + 1e-7)


def test_int8_file_is_quarter_the_bytes(tmp_path):
    params = {"fc": {"W": np.random.default_rng(0).normal(
        size=(512, 512)).astype(np.float32)}}
    p32 = str(tmp_path / "f32.npz")
    p8 = str(tmp_path / "i8.npz")
    save_checkpoint(p32, params)
    save_checkpoint(p8, params, dtype="int8")
    assert os.path.getsize(p8) < 0.30 * os.path.getsize(p32)


def test_int8_opt_state_stays_bf16(tmp_path):
    # moments must not be int8-quantized (too few decades); they ride the
    # bf16 path even under the int8 anchor dtype
    params = {"l": {"W": np.ones((8, 8), np.float32)}}
    opt = {"nu": {"l": {"W": np.full((8, 8), 3e-9, np.float32)}}}
    path = str(tmp_path / "w.npz")
    save_checkpoint(path, params, opt_state=opt, dtype="int8")
    with np.load(path) as z:
        opt_keys = [k for k in z.files if k.startswith("opt/")]
        assert opt_keys and all(k.endswith("@bf16") for k in opt_keys)
    restored = restore_opt_state(
        path, {"nu": {"l": {"W": np.zeros((8, 8), np.float32)}}})
    assert np.all(np.asarray(restored["nu"]["l"]["W"]) > 1e-9)
