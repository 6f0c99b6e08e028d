"""Serving a trained patch model: dense segmentation + quantization.

The reference workflows this mirrors:

* patch-wise full-slice evaluation — every voxel of a slice scored by the
  patch CNN (``PW_analyze_results.full_slice_eval``, :390-772) — here one
  batched :func:`full_slice_patchwise` call per volume (an im2col sweep per
  touched z-slab, not per-voxel gathers);
* FCN slice-batched dense inference with the full op set
  (``eval_utils.full_slice_segment``, :104-237);
* plus two TPU-native additions with no reference counterpart: bf16
  serving sweeps and int8 post-training quantization
  (``models/quant.py`` — per-out-channel int8 weights, dynamic activation
  scales, same ``apply_cnn`` path).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_patch_model(spec, vols, mask, mu, sd, patch_shape, steps, seed=0):
    """Supervised warm-up on a labeled grid (stand-in for an AL campaign;
    see examples/patchwise_al.py for the real loop)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nnal_tpu.data.batching import make_onehot
    from nnal_tpu.data.patches import (gather_labels,
                                       gather_patches_normalized,
                                       pad_volumes)
    from nnal_tpu.data.samplers import generate_grid_samples
    from nnal_tpu.models.cnn import init_cnn
    from nnal_tpu.models.optim import make_optimizer
    from nnal_tpu.models.train import make_train_step

    shape = tuple(np.asarray(vols[0]).shape)
    inds = generate_grid_samples(shape, 2)
    padded = pad_volumes(vols, patch_shape)
    # slice batches on HOST: an eager device slice compiles one XLA
    # program per distinct offset (the repo's recompile lesson), while
    # host slices feed ONE jitted step at a constant shape
    x = np.asarray(gather_patches_normalized(padded, jnp.asarray(inds),
                                             mu, sd, patch_shape, shape))
    y = make_onehot(np.asarray(gather_labels(mask, inds, shape)), 2)
    params, _ = init_cnn(spec, jax.random.key(seed))
    tx = make_optimizer("Adam", 1e-3)
    step = make_train_step(spec, tx)
    opt_state = tx.init(params)
    rng = jax.random.key(seed + 1)
    b = 256
    for i in range(steps):
        lo = (i * b) % max(1, x.shape[0] - b)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x[lo:lo + b]),
                                       jnp.asarray(y[lo:lo + b]),
                                       jax.random.fold_in(rng, i),
                                       jnp.asarray(i))
    print(f"warm-up done ({steps} steps, final loss {float(loss):.3f})")
    return params


def main(tiny: bool = False) -> dict:
    import jax
    import numpy as np

    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.data.patches import pad_volumes
    from nnal_tpu.evaluation.inference import (FCNInference,
                                               full_slice_patchwise)
    from nnal_tpu.evaluation.metrics import f_measure
    from nnal_tpu.models.quant import quantize_params
    from nnal_tpu.models.specs import create_model, create_tiramisu103
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    shape = (24, 24, 6) if tiny else (48, 48, 12)
    steps = 10 if tiny else 150
    vols, mask = synthetic_subject(shape=shape, n_modalities=2, n_blobs=8,
                                   seed=3)
    mu = np.array([float(np.nanmean(v)) for v in vols])
    sd = np.array([float(np.nanstd(v)) + 1e-6 for v in vols])
    patch_shape = (9, 9, 1)
    spec = create_model("PW", nclass=2, dropout_rate=0.2,
                        patch_shape=(9, 9, len(vols)))
    params = train_patch_model(spec, vols, mask, mu, sd, patch_shape, steps)

    # ---- dense per-voxel segmentation through the patch model ----------
    # ONE call sweeps all requested slices; 'bfloat16' here selects the
    # bf16-storage serving path (f32 is the default)
    ev = GridPoolEvaluator(spec, pad_volumes(vols, patch_shape), mu, sd,
                           patch_shape, shape, grid_spacing=1, ntb=4096)
    zs = list(range(shape[2]))
    planes = full_slice_patchwise(ev, params, zs, op="prediction")
    pred = np.stack([planes[z] for z in zs], axis=2)
    f_float = f_measure(pred.ravel(), np.nan_to_num(mask).ravel())
    print(f"dense patch-model segmentation: F={f_float:.3f} "
          f"over {pred.size} voxels")

    # ---- int8 post-training quantization --------------------------------
    qp = quantize_params(spec, params)
    planes_q = full_slice_patchwise(ev, qp, zs, op="prediction")
    pred_q = np.stack([planes_q[z] for z in zs], axis=2)
    agree = float(np.mean(pred_q == pred))
    f_int8 = f_measure(pred_q.ravel(), np.nan_to_num(mask).ravel())
    print(f"int8 serving: F={f_int8:.3f}, voxel agreement with float "
          f"{agree:.4f}")

    # ---- FCN dense inference (untrained net; demonstrates the op set) --
    fcn_spec = create_tiramisu103(2, (shape[0], shape[1], len(vols)),
                                  growth=2, depths=(2, 2))
    from nnal_tpu.models.cnn import init_cnn

    fcn_params, _ = init_cnn(fcn_spec, jax.random.key(7))
    slices = np.stack([np.stack([np.asarray(v)[:, :, z] for v in vols],
                                axis=-1) for z in zs]).astype(np.float32)
    inf = FCNInference(fcn_spec, batch=4)
    post = inf.segment(fcn_params, slices, op="posteriors")
    mc = inf.segment(fcn_params, slices, op="MC-posteriors", mc_T=3)
    print(f"FCN ops: posteriors {post.shape}, MC-posteriors {mc.shape} "
          f"(plus prediction/output/loss/sigma/MC-sigma)")
    return {"f_float": f_float, "f_int8": f_int8, "agreement": agree}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(a.tiny)
