"""Serving-side inference benchmarks (the deployment ops).

Three rows, each one JSON line; ``--write`` also records
``benchmarks/INFERENCE_r{tag}.json``:

1. ``pw_full_volume`` — stride-1 full-volume patch-wise segmentation with
   the flagship PW1 model (every voxel scored; reference
   ``full_slice_eval``, PW_analyze_results.py:673-770), f32 and bf16
   storage. The im2col slab sweep makes this ONE program dispatch per
   touched z-slab instead of the reference's per-voxel gather loops.
2. ``offgrid_pool`` — posterior scoring of a large arbitrary (off-grid)
   voxel set: the dense stride-1 slab route vs the per-patch
   dynamic-slice gather it replaces.
3. ``fcn_volume`` — slice-batched FC-DenseNet-103 (Tiramisu) dense
   segmentation (reference ``full_slice_segment``, eval_utils.py:104-237).

Run: ``python benchmarks/inference_bench.py [--write] [rNN]``.
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
from nnal_tpu.data.patches import pad_volumes  # noqa: E402
from nnal_tpu.models.cnn import init_cnn  # noqa: E402
from nnal_tpu.models.specs import create_model, create_tiramisu103  # noqa: E402
from nnal_tpu.scoring.grid_eval import GridPoolEvaluator  # noqa: E402
from nnal_tpu.evaluation.inference import (FCNInference,  # noqa: E402
                                           full_volume_patchwise)

ROWS = []


def _emit(row):
    ROWS.append(row)
    print(json.dumps(row))


def _pw_setup(on_tpu, compute_dtype):
    shape = (256, 256, 64) if on_tpu else (32, 32, 6)
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
                           compute_dtype=compute_dtype)
    return ev, params, shape


def bench_pw_full_volume(on_tpu):
    from nnal_tpu.models.quant import quantize_params

    for name, cd in (("f32", None), ("bf16", jnp.bfloat16),
                     ("int8", jnp.bfloat16)):
        ev, params, shape = _pw_setup(on_tpu, cd)
        if name == "int8":
            # int8 weights on the MXU; the bf16 compute dtype covers the
            # non-quantized surroundings (BN-free PW1: just the activations)
            params = quantize_params(ev.spec, params)
        # warmup/compile pass
        full_volume_patchwise(ev, params, op="posteriors")
        t0 = time.perf_counter()
        vol = full_volume_patchwise(ev, params, op="posteriors")
        dt = time.perf_counter() - t0
        nvox = int(np.prod(shape))
        _emit({"bench": "pw_full_volume", "dtype": name,
               "metric": "voxels_segmented_per_sec_per_chip",
               "value": round(nvox / dt, 1), "unit": "voxels/s/chip "
               "(stride-1 PW1 posterior, whole volume, one sweep)",
               "volume": list(shape), "wall_s": round(dt, 3),
               "checksum": float(np.asarray(vol, np.float64).mean())})


def bench_offgrid_pool(on_tpu):
    """Two off-grid workloads: (a) a SCATTERED set (uniform over the
    volume) — the router keeps the exact-cost per-patch gather; (b) a
    CLUSTERED set (a dense ROI over a few slices) — the router switches
    to the stride-1 slab sweep, which only pays for the touched slabs."""
    ev, params, shape = _pw_setup(on_tpu, jnp.bfloat16 if on_tpu else None)
    s1, s2, s3 = shape
    rng = np.random.RandomState(0)

    def _time(inds):
        ev.evaluate(params, inds, ("posteriors",))          # warmup
        t0 = time.perf_counter()
        out = ev.evaluate(params, inds, ("posteriors",))["posteriors"]
        return time.perf_counter() - t0, out

    # CPU count sits WELL below the routing threshold (1024 lands exactly
    # on the boundary: 1024*6 == 3 slabs * 32*32*2)
    n_sc = 65536 if on_tpu else 512
    scat = (rng.randint(0, s1, n_sc) * s2
            + rng.randint(0, s2, n_sc)) * s3 + rng.randint(0, s3, n_sc)
    scat[0] = (1 * s2 + 1) * s3 + 1       # guarantee off-grid
    assert not ev._offgrid_dense_worthwhile(scat)
    dt_sc, out_sc = _time(scat)
    _emit({"bench": "offgrid_pool_scattered",
           "metric": "offgrid_patches_per_sec",
           "value": round(n_sc / dt_sc, 1),
           "unit": "patches/s/chip (uniform-random voxels; router keeps "
                   "the per-patch gather)",
           "n": n_sc, "wall_s": round(dt_sc, 3),
           "checksum": float(np.asarray(out_sc, np.float64).mean())})

    nsl = 6 if on_tpu else 2              # ROI: most voxels of a few slices
    plane = np.nonzero(rng.rand(s1, s2) < 0.8)
    base = (plane[0] * s2 + plane[1]) * s3
    clus = np.concatenate([base + z for z in range(nsl)])
    clus[0] = (1 * s2 + 1) * s3           # guarantee off-grid
    assert ev._offgrid_dense_worthwhile(clus)
    dt_cl, out_cl = _time(clus)
    # the gather path it replaces, on a subset (rate is per-patch)
    n_g = 8192 if on_tpu else 256
    ev.offgrid_dense = False
    ev.evaluate(params, clus[:n_g], ("posteriors",))        # warmup
    t0 = time.perf_counter()
    ev.evaluate(params, clus[:n_g], ("posteriors",))
    dt_g = time.perf_counter() - t0
    ev.offgrid_dense = True
    _emit({"bench": "offgrid_pool_clustered",
           "metric": "offgrid_patches_per_sec",
           "value": round(len(clus) / dt_cl, 1),
           "unit": "patches/s/chip (dense ROI over a few slices; router "
                   "takes the stride-1 slab sweep)",
           "n": len(clus), "slices": nsl, "wall_s": round(dt_cl, 3),
           "gather_path_patches_per_sec": round(n_g / dt_g, 1),
           "speedup_vs_gather": round((len(clus) / dt_cl) / (n_g / dt_g),
                                      1),
           "checksum": float(np.asarray(out_cl, np.float64).mean())})


def bench_d3_sweep(on_tpu):
    """Multi-slice (d3=3) grid-pool scoring via the z-neighbor channel
    stack — the path that previously fell back to per-patch gathers."""
    shape = (256, 256, 48) if on_tpu else (28, 28, 6)
    d = 25 if on_tpu else 9
    m, d3, g = 2, 3, 2
    spec = create_model("PW", nclass=2, dropout_rate=0.5,
                        patch_shape=(d, d, m * d3))
    params, _ = init_cnn(spec, jax.random.key(0))
    vols, _ = synthetic_subject(shape=shape, n_modalities=m, seed=0)
    padded = pad_volumes(vols, (d, d, d3))
    mu = np.array([float(v.mean()) for v in vols])
    sd = np.array([float(v.std()) for v in vols])
    # z_chunk=2: the d3 stack triples the channels, so two stride-2
    # slices carry ~1.5x the activation bytes of the d3=1 bench's z4
    ev = GridPoolEvaluator(spec, padded, mu, sd, (d, d, d3), shape,
                           grid_spacing=g, z_chunk=2,
                           compute_dtype=jnp.bfloat16 if on_tpu else None)
    rng_np = np.random.RandomState(0)
    inds = (rng_np.randint(0, shape[0] // g, 4096) * g * shape[1]
            + rng_np.randint(0, shape[1] // g, 4096) * g) * shape[2] \
        + rng_np.randint(0, shape[2], 4096)
    ev.evaluate(params, inds, ("posteriors",), as_device=True)  # warmup
    n_pool = ev.nx * ev.ny * ev.nz
    t0 = time.perf_counter()
    out = ev.evaluate(params, inds, ("posteriors",), as_device=True)
    post = np.asarray(out["posteriors"])
    dt = time.perf_counter() - t0
    _emit({"bench": "d3_pool_sweep",
           "metric": "pool_patches_scored_per_sec_per_chip",
           "value": round(n_pool / dt, 1),
           "unit": "patches/s/chip (whole-grid posterior sweep, 3-slice "
                   "25x25x(2x3) patches via z-neighbor channel stack)",
           "pool": n_pool, "wall_s": round(dt, 3),
           "checksum": float(post.astype(np.float64).mean())})


def bench_fcn_volume(on_tpu):
    hw = 256 if on_tpu else 32
    nsl = 64 if on_tpu else 4
    m = 2
    spec = create_tiramisu103(2, (hw, hw, m)) if on_tpu else \
        create_tiramisu103(2, (hw, hw, m), growth=4, depths=(2, 2, 3))
    params, _ = init_cnn(spec, jax.random.key(0))
    rng = np.random.RandomState(0)
    vol = rng.randn(nsl, hw, hw, m).astype(np.float32)
    from nnal_tpu.models.quant import quantize_params

    qparams = quantize_params(spec, params)
    for name, cd, p in (("f32", None, params), ("bf16", jnp.bfloat16, params),
                        ("int8", jnp.bfloat16, qparams)):
        inf = FCNInference(spec, batch=2, compute_dtype=cd)
        inf.segment(p, vol[:2], op="posteriors")            # compile
        t0 = time.perf_counter()
        post = inf.segment(p, vol, op="posteriors")
        dt = time.perf_counter() - t0
        nvox = nsl * hw * hw
        _emit({"bench": "fcn_volume", "dtype": name,
               "metric": "voxels_segmented_per_sec_per_chip",
               "value": round(nvox / dt, 1),
               "unit": "voxels/s/chip (FC-DenseNet-103 posterior, batch 2)",
               "volume": [hw, hw, nsl], "wall_s": round(dt, 3),
               "checksum": float(np.asarray(post, np.float64).mean())})


def main():
    args = sys.argv[1:]
    write = "--write" in args
    tag = next((a for a in args if re.fullmatch(r"r\d+", a)), "r03")
    on_tpu = jax.devices()[0].platform == "tpu"
    bench_pw_full_volume(on_tpu)
    bench_offgrid_pool(on_tpu)
    bench_d3_sweep(on_tpu)
    bench_fcn_volume(on_tpu)
    if write:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"INFERENCE_{tag}.json")
        with open(path, "w") as f:
            json.dump({"hardware": str(jax.devices()[0]),
                       "date": time.strftime("%Y-%m-%d"),
                       "rows": ROWS}, f, indent=1)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
