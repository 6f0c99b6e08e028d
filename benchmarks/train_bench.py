"""Training throughput: scanned finetune patches/s at campaign scale,
f32 vs bf16 mixed precision (``train_dtype``).

Shapes mirror the 128^3 campaigns (PW1 25x25x2, b=64): one jitted
``lax.scan`` over all epochs' batches — the engines' production path
(engine/pw_experiment.finetune).  Appends rows to TRAIN_r03.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnal_tpu.core.platform import honor_env_platforms  # noqa: E402

honor_env_platforms()

import jax  # noqa: E402

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nnal_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from nnal_tpu.models.cnn import init_cnn  # noqa: E402
from nnal_tpu.models.optim import make_optimizer  # noqa: E402
from nnal_tpu.models.specs import create_pw1  # noqa: E402
from nnal_tpu.models.train import (  # noqa: E402
    build_batch_index_matrix,
    make_scanned_finetune,
)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "TRAIN_r03.json")


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    d = 25 if on_tpu else 9
    spec = create_pw1(2, 0.5, (d, d, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    tx = make_optimizer("Adam", 1e-3)

    # b=64 is the campaign batch (latency-bound inside the scan: per-step
    # matmuls too small to fill the MXU); b=1024 shows the MXU-bound
    # regime where mixed precision actually pays
    configs = [(4096, 64, 15), (16384, 1024, 15)] if on_tpu \
        else [(256, 32, 2)]
    rows = []
    for n, b, epochs in configs:
        rng = np.random.RandomState(0)
        x_all = jnp.asarray(rng.randn(n, d, d, 2), jnp.float32)
        y_all = jnp.asarray(np.eye(2)[rng.randint(0, 2, n)], jnp.float32)
        idx_mat, w_mat = build_batch_index_matrix(n, b, epochs, rng,
                                                  bucket=n)
        idx_mat, w_mat = jnp.asarray(idx_mat), jnp.asarray(w_mat)
        cw = jnp.ones((2,), jnp.float32)
        steps = int(np.asarray(w_mat).sum(1).astype(bool).sum())

        for name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
            run = make_scanned_finetune(spec, tx, batch_size=b,
                                        compute_dtype=cd)
            # warm (compile); donation means fresh buffers each call
            p = jax.tree_util.tree_map(jnp.copy, params)
            o = tx.init(params)
            p, o, losses = run(p, o, x_all, y_all, idx_mat, w_mat, cw,
                               jax.random.key(1))
            float(np.asarray(losses)[-1])
            dt = float("inf")
            for _ in range(3):
                p = jax.tree_util.tree_map(jnp.copy, params)
                o = tx.init(params)
                t0 = time.perf_counter()
                p, o, losses = run(p, o, x_all, y_all, idx_mat, w_mat, cw,
                                   jax.random.key(1))
                last = float(np.asarray(losses)[-1])
                dt = min(dt, time.perf_counter() - t0)
            rate = steps * b / dt
            row = {"bench": "scanned_finetune", "dtype": name,
                   "metric": "patches_trained_per_sec_per_chip",
                   "value": round(rate, 1), "steps": steps, "batch": b,
                   "epochs": epochs, "labeled_set": n,
                   "wall_s": round(dt, 3), "final_loss": round(last, 4)}
            rows.append(row)
            print(json.dumps(row))

    # FCN training step (conv-dominated, small params): the regime where
    # mixed precision actually pays — PW1's is param-traffic-bound (the
    # 55M-param FC stack's f32 Adam update + per-step master-weight cast
    # dwarf the batch compute)
    from nnal_tpu.models.specs import create_tiramisu103
    from nnal_tpu.models.train import make_train_step

    hw, bs = (96, 8) if on_tpu else (32, 2)
    fspec = create_tiramisu103(2, (hw, hw, 2), dropout_rate=0.0)
    fparams, _ = init_cnn(fspec, jax.random.key(1))
    rng = np.random.RandomState(1)
    xb = jnp.asarray(rng.randn(bs, hw, hw, 2), jnp.float32)
    yb = jnp.asarray(np.eye(2)[rng.randint(0, 2, (bs, hw, hw))],
                     jnp.float32)
    for name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        step = make_train_step(fspec, tx, fcn=True, compute_dtype=cd)
        p = jax.tree_util.tree_map(jnp.copy, fparams)
        o = tx.init(fparams)
        p, o, loss = step(p, o, xb, yb, jax.random.key(2), jnp.asarray(0))
        float(np.asarray(loss))
        reps = 10 if on_tpu else 2
        dt = float("inf")
        for _ in range(3):
            p = jax.tree_util.tree_map(jnp.copy, fparams)
            o = tx.init(fparams)
            t0 = time.perf_counter()
            for i in range(reps):
                p, o, loss = step(p, o, xb, yb, jax.random.key(2),
                                  jnp.asarray(i))
            last = float(np.asarray(loss))
            dt = min(dt, time.perf_counter() - t0)
        rate = reps * bs * hw * hw / dt
        row = {"bench": "fcn_train_step", "dtype": name,
               "metric": "labeled_pixels_per_sec_per_chip",
               "value": round(rate, 1), "batch": bs, "slice": [hw, hw],
               "model": "FC-DenseNet-103",
               "wall_s": round(dt, 3), "final_loss": round(last, 4)}
        rows.append(row)
        print(json.dumps(row))

    if on_tpu:
        doc = {"hardware": "TPU v5e (axon tunnel, single chip)",
               "note": "scanned_finetune: whole-finetune lax.scan (the "
                       "engines' production path), PW1 25x25x2 — "
                       "param-traffic-bound, bf16 ~neutral. "
                       "fcn_train_step: FC-DenseNet-103 dense training "
                       "step — conv-dominated, where train_dtype=bfloat16 "
                       "pays.",
               "results": rows}
        with open(OUT, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
