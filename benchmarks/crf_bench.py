"""DenseCRF backend benchmark -> CRF_r{N}.json.

Compares the native C++ permutohedral solver (runtime/dense_crf.cc, full
dense pairwise model) against the JAX truncated-window mean field
(evaluation/crf.meanfield_crf_2d) on (a) wall time at production slice /
volume sizes and (b) refinement quality on a synthetic noisy-posterior
fixture where ground truth is known.  Host-side CPU work — run it alone
(the box has one core).

Run: ``python benchmarks/crf_bench.py [round_tag]``
"""

from __future__ import annotations

import json
import pathlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnal_tpu.core.platform import honor_env_platforms  # noqa: E402

honor_env_platforms()

import numpy as np  # noqa: E402


def fixture(H, W, D=1, seed=0):
    rng = np.random.default_rng(seed)
    truth = np.zeros((H, W, D))
    truth[H // 4:3 * H // 4, W // 4:3 * W // 4, :] = 1.0
    # carve a notch so the boundary is not axis-trivial
    truth[H // 2:, W // 2:, :] = 0.0
    img = truth * 60 + rng.normal(0, 4, truth.shape)
    p1 = np.clip(0.75 * truth + 0.12 + rng.normal(0, 0.22, truth.shape),
                 0.01, 0.99)
    return truth, img.astype(np.float32), p1.astype(np.float32)


def err(pred, truth):
    return float(np.mean(pred != truth))


def time_it(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r03"
    from nnal_tpu.runtime.crf_native import (crf_native_available,
                                             dcrf2d_meanfield,
                                             dcrf3d_meanfield)

    assert crf_native_available()
    rows = []

    # --- 2D slice at production size, native vs JAX window -------------
    for H, W in ((256, 256), (512, 512)):
        truth, img, p1 = fixture(H, W)
        posts = np.stack([1 - p1[..., 0], p1[..., 0]], -1)
        t_nat, q = time_it(lambda: dcrf2d_meanfield(posts, img[..., 0],
                                                    iters=5))
        e_raw = err(p1[..., 0] > 0.5, truth[..., 0])
        e_nat = err(q.argmax(-1), truth[..., 0])
        row = {"case": f"2d_{H}x{W}_5it", "native_s": round(t_nat, 4),
               "err_raw": round(e_raw, 5), "err_native": round(e_nat, 5)}
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
            import jax.numpy as jnp

            from nnal_tpu.evaluation.crf import meanfield_crf_2d

            jposts = jnp.asarray(posts)
            jimg = jnp.asarray(img[..., 0])
            np.asarray(meanfield_crf_2d(jposts, jimg, iters=5))  # compile
            t_jax, qj = time_it(
                lambda: np.asarray(meanfield_crf_2d(jposts, jimg, iters=5)))
            row["jax_window_s"] = round(t_jax, 4)
            row["err_jax_window"] = round(err(np.asarray(qj).argmax(-1),
                                              truth[..., 0]), 5)
        except Exception as e:  # noqa: BLE001 — record, don't fail
            row["jax_window_error"] = str(e)[:120]
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- 3D volume (beyond-reference path) -----------------------------
    for H, W, D in ((128, 128, 32), (256, 256, 64)):
        truth, img, p1 = fixture(H, W, D, seed=1)
        posts = np.stack([1 - p1, p1], -1)
        t3, q3 = time_it(lambda: dcrf3d_meanfield(posts, img, iters=5),
                         reps=2)
        row = {"case": f"3d_{H}x{W}x{D}_5it", "native_s": round(t3, 3),
               "voxels_per_s": int(H * W * D / t3),
               "err_raw": round(err(p1 > 0.5, truth), 5),
               "err_native3d": round(err(q3.argmax(-1), truth), 5)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "hardware": "host CPU (1 core), g++ -O3 -march=native",
        "note": ("Native permutohedral DenseCRF (runtime/dense_crf.cc — "
                 "re-homes the reference's pydensecrf C++ dependency, "
                 "PW_analyze_results.py:539) vs the JAX radius-5 window "
                 "mean field. Full dense model: sxy_g=3/w=3 Gaussian + "
                 "sxy_b=50/srgb=4/w=10 bilateral, 5 iterations. err_* = "
                 "voxel error vs ground truth on a synthetic "
                 "noisy-posterior fixture."),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"CRF_{tag}.json")
    pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
