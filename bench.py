"""Benchmark: pool patches scored/sec/chip (posterior + diag-FIM).

Driver metric (BASELINE.md): maximize patches/sec/chip for fused
posterior + diag-FIM pool scoring on the flagship PW1 model;
``vs_baseline`` is measured against the BASELINE.json north star —
a 1M-patch pool scored in <2 s on a v5e-8 slice, i.e. 62,500
patches/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# allow `python bench.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nnal_tpu.models.cnn import init_cnn  # noqa: E402
from nnal_tpu.models.specs import create_model  # noqa: E402
from nnal_tpu.ops.scoring_fused import make_pool_scorer  # noqa: E402

BASELINE_PATCHES_PER_SEC_PER_CHIP = 1_000_000 / 2.0 / 8


def main():
    spec = create_model("PW", nclass=2, dropout_rate=0.5,
                        patch_shape=(25, 25, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    scorer = make_pool_scorer(spec, with_fim=True)

    on_tpu = jax.devices()[0].platform == "tpu"
    block = 16384 if on_tpu else 256
    n_blocks = 8 if on_tpu else 2

    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.normal(size=(block, 25, 25, 2)),
                          jnp.float32)

    # compile + warmup (np.asarray forces real execution — under the axon
    # tunnel block_until_ready returns before the device finishes)
    out = scorer(params, patches)
    float(np.asarray(out["uncertainty"]).sum())

    # dispatch all blocks first so executions queue back-to-back on the
    # device stream, then materialize — steady-state scoring throughput
    t0 = time.perf_counter()
    outs = [scorer(params, patches) for _ in range(n_blocks)]
    acc = sum(float(np.asarray(o["uncertainty"]).sum())
              + float(np.asarray(o["shrunk"]).ravel()[0]) for o in outs)
    dt = time.perf_counter() - t0

    scored = block * n_blocks
    rate = scored / dt
    print(json.dumps({
        "metric": "pool_patches_scored_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "patches/s/chip (posterior+diag-FIM, PW1 25x25x2, "
                "f32 storage / bf16 MXU passes)",
        "vs_baseline": round(rate / BASELINE_PATCHES_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
