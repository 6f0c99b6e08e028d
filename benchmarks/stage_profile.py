"""Per-stage roofline of the PW1 FIM-scoring pipeline on chip.

Round-3 verdict #4 asks whether a hand-fused Pallas kernel can beat XLA's
fusion on the fused FIM sweep (36.9% MFU at r3).  Before writing any
kernel, this measures where XLA actually spends the time: each PW1 stage
(conv1/conv2/pool/conv3/conv4/fc1/fc2) is timed standalone at sweep batch
shapes, in three forms —

  conv    : lax.conv_general_dilated as the sweep runs it (NHWC)
  im2col  : the same contraction as an explicit (positions, K) x (K, Cout)
            matmul (what XLA presumably lowers to; N = Cout pads to the
            128-lane MXU, e.g. conv2's Cout=32 -> 4x pad waste)
  ideal   : the transposed orientation (Cout, K) x (K, positions) — lanes
            carry positions (thousands), so padding waste ~vanishes; this
            is the orientation a Pallas tower kernel would use

plus the im2col extraction pass itself.  The useful-FLOP rate of each
form bounds what a Pallas rewrite of that stage could gain: if XLA's conv
already matches 'ideal', the padding hypothesis is dead and the kernel
would chase layout/fusion wins only.  Writes STAGE_PROFILE_r{N}.json.

Run: python benchmarks/stage_profile.py [r04] [--batch 8192]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnal_tpu.core.platform import honor_env_platforms  # noqa: E402

honor_env_platforms()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK_BF16 = 197e12   # v5e MXU peak (bf16), FLOP/s
PEAK_F32 = 49e12


def _mk_looped(op, n):
    """One jitted program running ``op`` n times with a scalar dependency
    chain (x perturbed by 1e-30*sum(prev out)) — defeats CSE, forces
    sequential execution, and costs one device dispatch total.  Per-op
    wall times come from DIFFERENCING two loop lengths, which cancels the
    tunnel's ~1 s per-dispatch latency (single-op timings here measured
    0.2 TFLOP/s on a matmul the chip runs at >150)."""
    @jax.jit
    def run(*args):
        def body(_, carry):
            x, acc = carry
            out = op(x, *args[1:])
            s = jnp.sum(out).astype(x.dtype) * jnp.asarray(1e-30, x.dtype)
            return (x + s, acc + s.astype(jnp.float32))
        x, acc = jax.lax.fori_loop(
            0, n, body, (args[0], jnp.float32(0.0)))
        return acc
    return run


def _time(op, *args, n_lo=8, n_hi=104):
    lo = _mk_looped(op, n_lo)
    hi = _mk_looped(op, n_hi)
    np.asarray(lo(*args)); np.asarray(hi(*args))   # compile + warm
    t0 = time.perf_counter(); np.asarray(lo(*args))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(hi(*args))
    t_hi = time.perf_counter() - t0
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def conv_stage(name, b, hw, cin, cout, k, dtype, rows):
    """Time one conv stage in conv/im2col-matmul/ideal-matmul forms."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, hw, hw, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(k, k, cin, cout)), dtype)
    useful = 2.0 * b * hw * hw * cout * (k * k * cin)

    @jax.jit
    def conv(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    # explicit im2col forms share one patch tensor (timed separately)
    K = k * k * cin
    M = b * hw * hw
    xm = jnp.asarray(rng.normal(size=(M, K)), dtype)
    wm = jnp.asarray(rng.normal(size=(K, cout)), dtype)
    wmT = jnp.asarray(np.asarray(wm).T.copy(), dtype)
    xmT = jnp.asarray(np.asarray(xm).T.copy(), dtype)

    @jax.jit
    def im2col_mm(a, bm):
        return jnp.dot(a, bm, preferred_element_type=jnp.float32)

    @jax.jit
    def ideal_mm(a, bm):
        return jnp.dot(a, bm, preferred_element_type=jnp.float32)

    @jax.jit
    def extract(x):
        return jax.lax.conv_general_dilated_patches(
            x, filter_shape=(k, k), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    peak = PEAK_BF16 if dtype == jnp.bfloat16 else PEAK_F32
    row = {"stage": name, "shape": f"({b},{hw},{hw},{cin})->{cout} k{k}",
           "useful_gflop": round(useful / 1e9, 2)}
    t = _time(conv, x, w)
    row["conv_tflops"] = round(useful / t / 1e12, 1)
    row["conv_mfu_pct"] = round(100 * useful / t / peak, 1)
    t = _time(im2col_mm, xm, wm)
    row["im2col_mm_tflops"] = round(useful / t / 1e12, 1)
    t = _time(ideal_mm, wmT, xmT)
    row["ideal_mm_tflops"] = round(useful / t / 1e12, 1)
    t = _time(extract, x)
    row["extract_ms"] = round(t * 1e3, 2)
    rows.append(row)
    print(json.dumps(row), flush=True)


def fc_stage(name, b, din, dout, dtype, rows):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, din)), dtype)
    w = jnp.asarray(rng.normal(size=(din, dout)), dtype)
    useful = 2.0 * b * din * dout

    @jax.jit
    def mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    peak = PEAK_BF16 if dtype == jnp.bfloat16 else PEAK_F32
    t = _time(mm, x, w)
    row = {"stage": name, "shape": f"({b},{din})x({din},{dout})",
           "useful_gflop": round(useful / 1e9, 2),
           "mm_tflops": round(useful / t / 1e12, 1),
           "mm_mfu_pct": round(100 * useful / t / peak, 1)}
    rows.append(row)
    print(json.dumps(row), flush=True)


def main():
    args = [a for a in sys.argv[1:]]
    tag = args[0] if args and args[0].startswith("r") else "r04"
    # conv stages use a smaller patch batch: the explicit im2col operand
    # is (b*625, k*k*cin) and 4096 patches would put multi-GB tensors in
    # HBM; 512 patches already yields multi-GFLOP timings
    bc, b = 512, 4096
    dtype = jnp.bfloat16
    rows = []
    print(f"devices: {jax.devices()}", flush=True)
    # PW1 stages at patch 25x25x2 (CAMPAIGNS protocol)
    conv_stage("conv1", bc, 25, 2, 24, 5, dtype, rows)
    conv_stage("conv2", bc, 25, 24, 32, 5, dtype, rows)
    conv_stage("conv3", bc, 13, 32, 48, 3, dtype, rows)
    conv_stage("conv4", bc, 13, 48, 96, 3, dtype, rows)
    fc_stage("fc1", b, 4704, 4096, dtype, rows)
    fc_stage("fc2", b, 4096, 4096, dtype, rows)
    # reference large matmul — the chip's practical ceiling
    fc_stage("peak_ref", 8192, 4096, 4096, dtype, rows)

    out = {"hardware": str(jax.devices()[0]),
           "batch": b, "dtype": "bfloat16",
           "note": ("Per-stage PW1 rates: conv (XLA NHWC), the same "
                    "contraction as (M,K)x(K,Cout) im2col matmul, and the "
                    "transposed (Cout,K)x(K,M) 'ideal' orientation whose "
                    "lane dim carries positions. Decides the round-4 "
                    "Pallas kernel scope (verdict #4)."),
           "stages": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"STAGE_PROFILE_{tag}.json")
    pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
