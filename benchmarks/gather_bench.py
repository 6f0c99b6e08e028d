"""Arbitrary-index patch-gather microbench: dynslice vs rowtake.

The off-grid SCATTERED pool path (scoring/pool_eval.py) is fronted by a
patch gather.  ``gather_patches`` (vmapped dynamic_slice) lowers to
tiny-slice gathers; ``gather_patches_rowtake`` reads whole padded rows
(large contiguous DMAs) and column-selects on the MXU with a one-hot
matmul at Precision.HIGHEST — bit-identical by construction, verified
here ON HARDWARE before any rate is reported.

Rows (one JSON line each; ``--write`` records ``GATHER_r{tag}.json``):
raw gather patches/s for both impls at 25x25x{1,2,3} on a (256,256,64)
2-modality volume, plus the end-to-end scattered posterior sweep with
the winning impl.

Run: ``python benchmarks/gather_bench.py [--write] [rNN]``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnal_tpu.core.platform import honor_env_platforms  # noqa: E402

honor_env_platforms()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)

from nnal_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from nnal_tpu.data.io import synthetic_subject  # noqa: E402
from nnal_tpu.data.patches import (  # noqa: E402
    gather_patches,
    gather_patches_rowtake,
    pad_volumes,
)

ROWS = []


def _emit(row):
    ROWS.append(row)
    print(json.dumps(row))


def bench_raw(on_tpu):
    shape = (256, 256, 64) if on_tpu else (32, 32, 8)
    d = 25 if on_tpu else 9
    m = 2
    ntb = 4096 if on_tpu else 512
    n = ntb * (16 if on_tpu else 2)
    rng = np.random.RandomState(0)
    vols, _ = synthetic_subject(shape=shape, n_modalities=m, seed=0)
    inds = (rng.randint(0, shape[0], n) * shape[1]
            + rng.randint(0, shape[1], n)) * shape[2] \
        + rng.randint(0, shape[2], n)
    best = {}
    for d3 in (1, 2, 3):
        patch_shape = (d, d, d3)
        padded = pad_volumes(vols, patch_shape)
        chunk0 = jnp.asarray(inds[:ntb])
        ref = np.asarray(gather_patches(padded, chunk0, patch_shape, shape))
        fast = np.asarray(gather_patches_rowtake(padded, chunk0,
                                                 patch_shape, shape))
        exact = bool(np.array_equal(ref, fast))
        for name, fn in (("dynslice", gather_patches),
                         ("rowtake", gather_patches_rowtake)):
            # warm every chunk program, then time a full pass; reduce on
            # device and materialize (block_until_ready lies on the tunnel)
            def sweep():
                acc = 0.0
                for lo in range(0, n, ntb):
                    p = fn(padded, jnp.asarray(inds[lo:lo + ntb]),
                           patch_shape, shape)
                    acc += float(np.asarray(jnp.sum(p)))
                return acc
            sweep()
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                sweep()
                dt = min(dt, time.perf_counter() - t0)
            rate = n / dt
            best.setdefault(d3, {})[name] = rate
            _emit({"bench": f"gather_raw_d3_{d3}", "impl": name,
                   "metric": "gather_patches_per_sec_per_chip",
                   "value": round(rate, 1),
                   "unit": f"patches/s/chip ({d}x{d}x{m}*{d3} f32 gather "
                           "only, scattered uniform indices)",
                   "n": n, "wall_s": round(dt, 3),
                   "bit_identical": exact})
        _emit({"bench": f"gather_speedup_d3_{d3}",
               "metric": "rowtake_over_dynslice",
               "value": round(best[d3]["rowtake"] / best[d3]["dynslice"], 2),
               "unit": "x", "bit_identical": exact})
    return best


def bench_e2e(on_tpu):
    """Scattered off-grid posterior scoring end-to-end with the impl set
    by NNAL_GATHER_IMPL (one impl per process: the jitted eval chunk
    traces the gather once)."""
    from nnal_tpu.models.cnn import init_cnn
    from nnal_tpu.models.specs import create_model
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    impl = os.environ.get("NNAL_GATHER_IMPL", "dynslice")
    shape = (256, 256, 64) if on_tpu else (32, 32, 8)
    d = 25 if on_tpu else 9
    m = 2
    spec = create_model("PW", nclass=2, dropout_rate=0.5,
                        patch_shape=(d, d, m))
    params, _ = init_cnn(spec, jax.random.key(0))
    vols, _ = synthetic_subject(shape=shape, n_modalities=m, seed=0)
    padded = pad_volumes(vols, (d, d, 1))
    mu = np.array([float(v.mean()) for v in vols])
    sd = np.array([float(v.std()) for v in vols])
    ev = GridPoolEvaluator(spec, padded, mu, sd, (d, d, 1), shape,
                           grid_spacing=2, z_chunk=4 if on_tpu else 2,
                           compute_dtype=jnp.bfloat16 if on_tpu else None)
    n = 65536 if on_tpu else 512
    rng = np.random.RandomState(0)
    scat = (rng.randint(0, shape[0], n) * shape[1]
            + rng.randint(0, shape[1], n)) * shape[2] \
        + rng.randint(0, shape[2], n)
    scat[0] = (1 * shape[1] + 1) * shape[2] + 1     # guarantee off-grid
    ev.offgrid_dense = False                        # force the gather path
    ev.evaluate(params, scat, ("posteriors",))      # warmup
    t0 = time.perf_counter()
    out = ev.evaluate(params, scat, ("posteriors",))["posteriors"]
    dt = time.perf_counter() - t0
    _emit({"bench": "offgrid_scattered_e2e", "impl": impl,
           "metric": "offgrid_patches_per_sec",
           "value": round(n / dt, 1),
           "unit": "patches/s/chip (scattered posterior scoring, "
                   "gather + bf16 forward)",
           "n": n, "wall_s": round(dt, 3),
           "checksum": float(np.asarray(out, np.float64).mean())})


def main():
    args = sys.argv[1:]
    write = "--write" in args
    tag = next((a for a in args if re.fullmatch(r"r\d+", a)), "r03")
    on_tpu = jax.devices()[0].platform == "tpu"
    bench_raw(on_tpu)
    bench_e2e(on_tpu)
    if write:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"GATHER_{tag}.json")
        with open(path, "w") as f:
            json.dump({"hardware": str(jax.devices()[0]),
                       "date": time.strftime("%Y-%m-%d"),
                       "gather_impl_env": os.environ.get("NNAL_GATHER_IMPL",
                                                         "dynslice"),
                       "rows": ROWS}, f, indent=1)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
