"""bf16-storage FIM scoring vs the f32 path (round-1 verdict weak #6):
the custom-VJP convs make the bf16 backward legal; selections must be
rank-compatible with f32."""

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model
from nnal_tpu.ops.scoring_fused import pool_score_fused
from nnal_tpu.scoring.fisher import a_matrices
from nnal_tpu.scoring.sdp import fi_query_distribution


def _setup(b=64):
    spec = create_model("PW", nclass=2, dropout_rate=0.5,
                        patch_shape=(15, 15, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (b, 15, 15, 2))
    return spec, params, x


def test_bf16_fim_finite_and_close():
    spec, params, x = _setup()
    r32 = pool_score_fused(spec, params, x, True)
    r16 = pool_score_fused(spec, params, x, True, jnp.bfloat16)
    assert np.isfinite(np.asarray(r16["shrunk"])).all()
    # posteriors track within bf16 resolution
    assert np.abs(np.asarray(r32["p1"])
                  - np.asarray(r16["p1"])).max() < 0.05
    # shrunk gradients agree where they carry signal (bf16 storage keeps
    # ~2-3 significant digits through the depth of the net; selections —
    # the product surface — are rank-tested below)
    s32 = np.asarray(r32["shrunk"])
    s16 = np.asarray(r16["shrunk"])
    scale = np.abs(s32).max()
    assert np.abs(s32 - s16).max() < 0.25 * scale
    # and correlate almost perfectly overall
    corr = np.corrcoef(s32.ravel(), s16.ravel())[0, 1]
    assert corr > 0.99, corr


def test_bf16_rank_identical_uncertainty_selection():
    spec, params, x = _setup()
    r32 = pool_score_fused(spec, params, x, True)
    r16 = pool_score_fused(spec, params, x, True, jnp.bfloat16)
    B = 16
    top32 = np.argsort(np.abs(np.asarray(r32["p1"]) - 0.5),
                       kind="stable")[:B]
    top16 = np.argsort(np.abs(np.asarray(r16["p1"]) - 0.5),
                       kind="stable")[:B]
    assert len(set(top32) & set(top16)) >= B - 1


def test_bf16_fi_query_distribution_agrees():
    spec, params, x = _setup(32)
    r32 = pool_score_fused(spec, params, x, True)
    r16 = pool_score_fused(spec, params, x, True, jnp.bfloat16)

    def qdist(r):
        A = np.asarray(a_matrices(jnp.asarray(np.asarray(r["shrunk"])),
                                  jnp.asarray(np.asarray(r["p1"]),
                                              jnp.float32), 1e-3))
        return fi_query_distribution(A, 0.0, None, 5)

    q32, q16 = qdist(r32), qdist(r16)
    # same support heavy hitters
    t32 = set(np.argsort(-q32)[:8])
    t16 = set(np.argsort(-q16)[:8])
    assert len(t32 & t16) >= 6, (sorted(t32), sorted(t16))
