"""Per-sample gradient machinery for Fisher-information querying.

The reference's FI bottleneck is **one sess.run per sample per class** to get
``grad_posts[j] = d log p(y=j|x) / d theta`` followed by host-side 'sum'
shrinkage — mean of all entries per layer (NNAL.py:354-414,
PW_NNAL.py:738-816, NNAL_tools.py:778-831).

TPU-native key idea — the **epsilon trick**: for 'sum' shrinkage only the
*sum of gradient entries per layer* is needed.  Define

    f(eps) = log p_c( x ; {W_l + eps_l * 1, b_l + eps_l * 1} )

Then ``df/deps_l = sum(dlogp/dW_l) + sum(dlogp/db_l)`` — exactly the layer's
entry-sum — so ONE reverse-mode pass per (sample, class) yields all L shrunk
components with O(L) output memory instead of O(#params).  ``vmap`` over
samples and classes turns the reference's per-sample session loop into a
single batched XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import apply_cnn


def grad_param_layers(spec, params) -> List[str]:
    """Layers carrying W/b, in spec order (the reference's grad target set)."""
    return [l.name for l in spec.layers
            if l.name in params and "W" in params[l.name]]


def layer_sizes(spec, params) -> np.ndarray:
    """numel(W)+numel(b) per grad layer — the shrinkage denominator
    (reference NNAL_tools.py:784-796)."""
    return np.array([int(np.prod(params[n]["W"].shape))
                     + int(np.prod(params[n]["b"].shape))
                     for n in grad_param_layers(spec, params)])


# bf16-storage conv with f32 accumulation and a legal VJP — shared with
# mixed-precision training; see models/cnn.make_conv_f32acc.  The FIM
# scores this feeds are layer-mean reductions, insensitive to the bf16
# cotangent rounding (rank parity is tested).
from nnal_tpu.models.cnn import make_conv_f32acc as _make_conv_f32acc  # noqa: E402


def _conv1_mm_enabled() -> bool:
    """Trace-time flag for the first-conv im2col-matmul lowering (see
    `_eps_layer`); set NNAL_CONV1_MM=1 before the first scoring call."""
    import os

    return os.environ.get("NNAL_CONV1_MM", "0") == "1"


@jax.custom_vjp
def _relu_save_output(x):
    return jax.nn.relu(x)


def _relu_save_output_fwd(x):
    y = jax.nn.relu(x)
    return y, y


def _relu_save_output_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros((), g.dtype)),)


# relu whose backward residual is its OUTPUT (the mask y>0 equals x>0
# exactly, matching jax.nn.relu's zero-subgradient-at-0 convention, so the
# gradients are bitwise identical).  The stock relu saves its INPUT, which
# keeps BOTH the pre-activation and the next layer's input copy live
# through the scoring backward — the output is live anyway as the next
# conv/fc residual, so this frees one full activation per layer and is
# what (with the pre-act downcast) fits larger z-chunks in HBM.
_relu_save_output.defvjp(_relu_save_output_fwd, _relu_save_output_bwd)


def _cast_act(spec, layer, act, z, cd):
    """Apply ``layer``'s activation with the compute-dtype downcast placed
    where it is numerically safe.  For relu the cast goes BEFORE the
    activation: rounding preserves sign, so relu∘round == round∘relu
    bitwise, and the activation's saved backward residual becomes bf16
    instead of the f32 conv output — those residual bytes are what bound
    the scoring z-chunk on 16 GB HBM.  For any other activation (elu/
    tanh/gelu are curved, so act(bf16(z)) != bf16(act(z))) the cast stays
    AFTER, preserving the f32 activation numerics."""
    if cd is None:
        return act(z) if "A" in layer.op_order else z
    if spec.activation == "relu":
        z = z.astype(cd)
        return act(z) if "A" in layer.op_order else z
    h = act(z) if "A" in layer.op_order else z
    return h.astype(cd)


def _eps_layer(spec, params, layer, h, E, li, cd):
    """One eps-injected layer application (see :func:`_apply_with_eps`).
    Returns ``(h_out, li_out)``."""
    from nnal_tpu.models.cnn import _act, _dimension_numbers, _main_op

    rank = spec.spatial_rank
    act = (_relu_save_output if spec.activation == "relu"
           else _act(spec.activation))
    if layer.kind == "conv":
        p = params[layer.name]
        W = p["W"].astype(h.dtype)
        K_contract = int(np.prod(layer.ksize)) * int(h.shape[-1])
        if (_conv1_mm_enabled() and rank == 2 and K_contract <= 128
                and "A" in layer.op_order):
            # experimental first-conv im2col lowering (NNAL_CONV1_MM=1):
            # C_in=2 starves the MXU as a conv (6.5 TF/s standalone vs
            # 25.4 as an explicit matmul, STAGE_PROFILE_r04).  The
            # per-window SAME semantics are preserved (patches pad at
            # each sample's own border), and wsum falls out of the same
            # patch tensor as a row sum.  Not bitwise-identical to the
            # conv lowering (different contraction order), hence opt-in.
            pat = jax.lax.conv_general_dilated_patches(
                h, filter_shape=layer.ksize,
                window_strides=layer.strides, padding=layer.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # dilated_patches emits features channel-major: (c, kh, kw)
            Wm = jnp.transpose(W, (2, 0, 1, 3)).reshape(K_contract, -1)
            z = jnp.einsum("nhwk,ko->nhwo", pat, Wm,
                           preferred_element_type=jnp.float32) + p["b"]
            wsum = jnp.sum(pat.astype(jnp.float32), axis=-1,
                           keepdims=True)
            e = E[:, li].reshape((-1,) + (1,) * (rank + 1))
            z = z + e * (wsum + 1.0)
            h = _cast_act(spec, layer, act, z, cd)
            return h, li + 1
        if cd is None:
            dn = jax.lax.conv_dimension_numbers(
                h.shape, W.shape, _dimension_numbers(rank))
            z = jax.lax.conv_general_dilated(
                h, W, layer.strides, layer.padding,
                dimension_numbers=dn,
                preferred_element_type=jnp.float32) + p["b"]
            ones = jnp.ones(layer.ksize + (h.shape[-1], 1), h.dtype)
            wsum = jax.lax.conv_general_dilated(
                h, ones, layer.strides, layer.padding,
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    h.shape, ones.shape, _dimension_numbers(rank)),
                preferred_element_type=jnp.float32)
        else:
            conv = _make_conv_f32acc(layer.strides, layer.padding,
                                     rank)
            z = conv(h, W) + p["b"]
            ones = jnp.ones(layer.ksize + (h.shape[-1], 1), h.dtype)
            wsum = conv(h, ones)
        e = E[:, li].reshape((-1,) + (1,) * (rank + 1))
        z = z + e * (wsum + 1.0)
        h = _cast_act(spec, layer, act, z, cd)
        return h, li + 1
    if layer.kind == "fc":
        p = params[layer.name]
        h2 = h.reshape(h.shape[0], -1)
        z = jnp.dot(h2, p["W"].astype(h2.dtype),
                    preferred_element_type=jnp.float32) + p["b"]
        s = jnp.sum(h2.astype(jnp.float32), axis=1, keepdims=True)
        z = z + E[:, li:li + 1] * (s + 1.0)
        h = _cast_act(spec, layer, act, z, cd)
        return h, li + 1
    if layer.kind in ("pool", "avgpool"):
        return _main_op(spec, layer, {}, h, rank), li
    raise NotImplementedError(
        f"eps-injected forward does not support {layer.kind!r}; "
        "use shrunk_class_grads_persample")


def _apply_with_eps(spec, params, x, E, compute_dtype=None,
                    remat: bool = False):
    """Forward pass with a per-sample epsilon injected into every parameter
    layer: layer l behaves as if ``W_l + E[i,l]*1`` and ``b_l + E[i,l]*1``
    for sample i.

    The perturbation is *linear* in eps — ``conv(h, W + e) = conv(h, W) +
    e * (conv(h, ones) + 1)`` and ``(W + e)^T h + (b + e) = z + e *
    (sum(h) + 1)`` — so it costs one cheap extra reduction per layer, and
    ``d logits / d E`` at E=0 is exactly the per-sample entry-sum gradient.
    Supports the conv/pool/fc layer family (PW1/VGG-style specs).

    ``compute_dtype=bfloat16`` keeps activations/filters in bf16 *between*
    layers (true bf16 storage) while every matmul/conv accumulates f32 —
    the convs go through a custom-VJP wrapper so the backward pass is
    legal (see :func:`_make_conv_f32acc`).

    ``remat=True`` splits the stack into segments at pool boundaries and
    wraps each in ``jax.checkpoint``: the backward then stores only the
    segment *inputs* (post-pool activations, 4x smaller each stage)
    instead of every pre-pool conv activation — the activation memory, not
    FLOPs, is what bounds the scoring chunk size on 16 GB HBM (z_chunk=8
    OOMed without it), and the recomputed convs are the FLOP minority
    (the FC stack dominates and is still stored).
    """
    cd = compute_dtype
    h = x if cd is None else x.astype(cd)

    if not remat:
        li = 0
        for layer in spec.layers:
            h, li = _eps_layer(spec, params, layer, h, E, li, cd)
        return h  # logits

    # segments split AFTER each pool layer; each checkpointed
    segments, cur = [], []
    for layer in spec.layers:
        cur.append(layer)
        if layer.kind in ("pool", "avgpool"):
            segments.append(cur)
            cur = []
    if cur:
        segments.append(cur)

    li0 = 0
    for seg_layers in segments:
        def seg_fn(h_in, E_in, params_in, _layers=tuple(seg_layers),
                   _li0=li0):
            hh, li = h_in, _li0
            for layer in _layers:
                hh, li = _eps_layer(spec, params_in, layer, hh, E_in, li,
                                    cd)
            return hh

        h = jax.checkpoint(seg_fn)(h, E, params)
        li0 += sum(1 for l in seg_layers if l.kind in ("conv", "fc"))
    return h  # logits


@partial(jax.jit, static_argnames=("spec", "compute_dtype", "remat"))
def shrunk_class_grads(spec, params, x: jnp.ndarray,
                       compute_dtype=None, remat: bool = False
                       ) -> jnp.ndarray:
    """(b, c, L) 'sum'-shrunk class gradients (see
    :func:`shrunk_class_grads_with_logits`)."""
    return shrunk_class_grads_with_logits(spec, params, x,
                                          compute_dtype, remat)[0]


@partial(jax.jit, static_argnames=("spec", "compute_dtype", "remat"))
def shrunk_class_grads_with_logits(spec, params, x: jnp.ndarray,
                                   compute_dtype=None,
                                   remat: bool = False):
    """'sum'-shrunk per-class log-posterior gradients for a patch batch.

    Returns ``(b, c, L)``: per layer, ``mean of entries of
    d log p(y=c|x_i) / d theta_layer`` — bit-matching the reference's
    ``shrink_gradient(..., 'sum')`` (NNAL_tools.py:778-831).

    TPU-native fast path: gradients w.r.t. a per-sample epsilon matrix
    injected into ONE batch forward (see :func:`_apply_with_eps`) — each
    class costs a single batch backward pass, versus the reference's one
    sess.run per sample per class (PW_NNAL.py:738-816).
    """
    names = grad_param_layers(spec, params)
    sizes = jnp.asarray(layer_sizes(spec, params), jnp.float32)
    nclass = spec.nclass
    b = x.shape[0]
    E0 = jnp.zeros((b, len(names)), jnp.float32)

    def class_sum(E, c):
        logits = _apply_with_eps(spec, params, x, E, compute_dtype, remat)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # sum over samples: d/dE[i, l] touches only sample i's logp
        return jnp.sum(logp[:, c]), logits

    g = jax.grad(class_sum, has_aux=True)
    # classes 1..c-1 via backward passes; class 0 from the softmax
    # zero-sum identity sum_c p_c * grad(log p_c) = 0, which holds exactly
    # per sample — saving one full backward pass (for binary: halving them)
    grads_rest, logits = jax.vmap(lambda c: g(E0, c))(
        jnp.arange(1, nclass))                   # (c-1, b, L), (c-1, b, C)
    logits = logits[0]
    posts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # (b, C)
    weighted = jnp.einsum("cb,cbl->bl", jnp.transpose(posts[:, 1:]),
                          grads_rest)
    p0 = jnp.clip(posts[:, 0], 1e-12)
    g0 = -weighted / p0[:, None]                  # (b, L)
    grads = jnp.concatenate([g0[None], grads_rest], axis=0)  # (c, b, L)
    return jnp.transpose(grads, (1, 0, 2)) / sizes, logits


@partial(jax.jit, static_argnames=("spec", "patch_shape", "orig_shape",
                                   "compute_dtype"))
def gather_shrunk_a_matrices(spec, params, padded, inds, mu, sd,
                             patch_shape, orig_shape, posts_p1,
                             diag_load=1e-5, compute_dtype=None):
    """ONE device program for the FI scoring tail: candidate patch gather
    (+normalize) -> 'sum'-shrunk class gradients -> conditional-FI
    A-matrices.

    The unfused pipeline dispatched three programs per subject and
    materialized the (B, d1, d2, m*d3) patch tensor between them; over the
    tunnel each extra dispatch costs ~0.1-0.3 s of latency and the fused
    form keeps every intermediate on device — only the (B, L, L)
    A-matrices (a few hundred KB) ever cross to host.  Replaces the
    reference's one-sess.run-per-sample-per-class loop + host assembly
    (PW_NNAL.py:738-816) end to end."""
    from nnal_tpu.data.patches import gather_patches_normalized
    from nnal_tpu.scoring.fisher import a_matrices

    x = gather_patches_normalized(padded, inds, mu, sd, patch_shape,
                                  orig_shape)
    shrunk = shrunk_class_grads_with_logits(spec, params, x,
                                            compute_dtype)[0]
    return a_matrices(shrunk, posts_p1, diag_load)


@partial(jax.jit, static_argnames=("spec",))
def shrunk_class_grads_persample(spec, params, x: jnp.ndarray) -> jnp.ndarray:
    """Oracle implementation: vmapped per-sample parameter perturbation
    (slow; kept for parity tests and for specs the fast path does not
    support, e.g. BN/skip architectures)."""
    names = grad_param_layers(spec, params)
    sizes = jnp.asarray(layer_sizes(spec, params), jnp.float32)
    nclass = spec.nclass

    def f(eps, xi, c):
        perturbed = dict(params)
        for j, n in enumerate(names):
            p = dict(params[n])
            p["W"] = params[n]["W"] + eps[j]
            p["b"] = params[n]["b"] + eps[j]
            perturbed[n] = p
        out = apply_cnn(spec, perturbed, xi[None])
        return jax.nn.log_softmax(out.logits, axis=-1)[0, c]

    g = jax.grad(f)
    eps0 = jnp.zeros((len(names),), jnp.float32)
    per_sample = jax.vmap(
        lambda xi: jax.vmap(lambda c: g(eps0, xi, c))(jnp.arange(nclass)))
    return per_sample(x) / sizes  # (b, c, L)


@partial(jax.jit, static_argnames=("spec",))
def per_sample_grads(spec, params, x, y_onehot):
    """Full per-sample loss gradients via ``vmap(grad)`` — pytree with a
    leading batch axis (used by diagonal Fisher; reference computes these
    one sess.run per sample, model_utils.py:294-330)."""
    def loss_one(p, xi, yi):
        out = apply_cnn(spec, p, xi[None])
        logp = jax.nn.log_softmax(out.logits, axis=-1)
        return -jnp.sum(yi * logp[0])

    return jax.vmap(lambda xi, yi: jax.grad(loss_one)(params, xi, yi))(
        x, y_onehot)


def diagonal_fisher(spec, params, X, Y_onehot, chunk: int = 64):
    """Diagonal Fisher: mean over samples of squared per-sample gradients,
    per parameter (reference ``diagonal_Fisher``, model_utils.py:294-330).

    Chunked over the batch to bound vmap memory; running mean uses the
    reference's ``(i*F + g^2)/(i+1)`` accumulation per sample, implemented
    as an exact mean over all samples.
    """
    X = jnp.asarray(X)
    Y = jnp.asarray(Y_onehot)
    n = X.shape[0]
    acc = None
    seen = 0
    for lo in range(0, n, chunk):
        xs, ys = X[lo:lo + chunk], Y[lo:lo + chunk]
        g = per_sample_grads(spec, params, xs, ys)
        sq = jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32) ** 2, axis=0), g)
        if acc is None:
            acc = sq
        else:
            acc = jax.tree_util.tree_map(jnp.add, acc, sq)
        seen += xs.shape[0]
    return jax.tree_util.tree_map(lambda a: a / seen, acc)


# --------------------------------------------------------------------------- #
# alternative shrinkage modes (reference NNAL_tools.py:778-831)
# --------------------------------------------------------------------------- #
def shrink_gradient_pytree(grads: dict, spec, method: str = "sum",
                           rng=None, nppl: int = 0) -> np.ndarray:
    """Shrink a full gradient pytree ``{layer: {W, b}}`` host-side; 'sum'
    (mean of entries/layer), 'max' (entry of max magnitude), 'rand'
    (random subsample of nppl entries/layer)."""
    out = []
    names = [l.name for l in spec.layers if l.name in grads
             and "W" in grads[l.name]]
    for n in names:
        gw = np.asarray(grads[n]["W"]).ravel()
        gb = np.asarray(grads[n]["b"]).ravel()
        cat = np.concatenate([gw, gb])
        if method == "sum":
            out.append(cat.sum() / cat.size)
        elif method == "max":
            out.append(cat[np.argmax(np.abs(cat))])
        elif method == "rand":
            idx = rng.choice(cat.size, size=min(nppl, cat.size),
                             replace=False)
            out.extend(cat[idx])
        else:
            raise ValueError(method)
    return np.asarray(out)
