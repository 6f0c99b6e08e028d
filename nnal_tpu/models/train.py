"""Training: jitted step + step-bounded loop with metric tracking.

Rebuilds the reference train loops — epoch-based ``train_graph_one_epoch``
(NN.py:647), validated training with best-weights rollback (NN.py:744), and
the v2 step-bounded ``train`` with periodic validation metrics, best-model
checkpointing and teacher-EMA updates (NN_extended.py:928-1008) — around one
jitted ``train_step`` whose gradient math (masking, PFT, weight decay,
consistency) is fused into a single XLA program.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nnal_tpu.models.cnn import apply_cnn
from nnal_tpu.models.losses import (
    consistency_loss,
    fcn_cross_entropy,
    weight_decay_penalty,
)
from nnal_tpu.models.optim import apply_grad_mask, ema_update, make_optimizer


@dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    step: int = 0
    bn_state: Optional[Dict] = None
    teacher_params: Optional[Dict] = None
    metrics: Dict = field(default_factory=dict)  # name -> list of values


def _wmean(per, w):
    """Mean of per-sample losses; with weights ``w`` the weighted mean, so
    zero-weight (padding) rows are exact no-ops."""
    if w is None:
        return jnp.mean(per)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def _cast_for_forward(compute_dtype, params, x):
    """Mixed-precision cast at the loss boundary: bf16 activations/weights
    on the MXU with f32 master params and f32 optimizer state.  The cast
    sits INSIDE the differentiated function, so its transpose upcasts the
    cotangents and gradients come out f32, matching the param pytree; the
    loss itself is f32 because ``apply_cnn`` upcasts the logits.  int8
    serving pytrees are rejected upstream (rounding is non-differentiable)."""
    if compute_dtype is None:
        return params, x
    from nnal_tpu.models.cnn import cast_float_params

    return cast_float_params(params, compute_dtype), x.astype(compute_dtype)


def make_train_step(spec, tx: optax.GradientTransformation, *,
                    fcn: bool = False, class_weights=None,
                    focal_gamma=None, weight_decay: float = 0.0,
                    grad_mask=None, consistency_coeff: Optional[Callable] = None,
                    consistency_measure: str = "CE", mc_t: int = 10,
                    lwf_lambda: float = 0.0, lwf_T: float = 2.0,
                    compute_dtype=None):
    """Build a jitted ``(params, opt_state, x, y, rng, step, [teacher],
    [w], [old_logits]) -> (params, opt_state, loss)`` train step.

    Aleatoric specs (``spec.aleatoric``) train the AU_4L heteroscedastic
    loss (logit-noise CE over ``mc_t`` samples, reference
    NN_extended.py:1520-1562) — the sigma head is part of the spec, so the
    loss follows it automatically.

    ``w`` (optional per-sample weights) makes padding rows exact no-ops so
    ragged batches can be padded to one stable shape (the repo's
    shape-stability rule).  ``lwf_lambda > 0`` adds learning-without-
    forgetting distillation against precomputed ``old_logits`` of the
    previous model at temperature ``lwf_T`` (reference ``get_LwF``,
    model_utils.py:98-135: old-model soft targets added to CE).

    ``compute_dtype=bfloat16`` trains mixed-precision (bf16 forward/backward
    on the MXU, f32 master params + optimizer state; no reference
    counterpart — the TF1 code is f32-only)."""
    from nnal_tpu.models.losses import aleatoric_ce_per_sample

    def loss_fn(params, x, y, w, old_logits, rng, teacher_params, step,
                cw_rt=None, cc_scale=1.0):
        params, x = _cast_for_forward(compute_dtype, params, x)
        out = apply_cnn(spec, params, x, train=True, dropout_rng=rng)
        if getattr(spec, "aleatoric", False):
            per = aleatoric_ce_per_sample(
                out.logits, out.log_sigma.astype(jnp.float32), y,
                jax.random.fold_in(rng, 1), mc_t)
            base = _wmean(per, w)
        elif fcn:
            base = fcn_cross_entropy(out.logits, y, class_weights,
                                     focal_gamma)
        else:
            logp = jax.nn.log_softmax(out.logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            # class weights: build-time constant, or a RUNTIME vector (so
            # per-round "auto" inverse-frequency weights do not bake a new
            # program each AL round — shape-stability rule)
            cwv = class_weights if class_weights is not None else cw_rt
            if cwv is not None:
                per = per * jnp.sum(y * jnp.asarray(cwv), axis=-1)
            base = _wmean(per, w)
        loss = base
        if lwf_lambda > 0.0 and old_logits is not None:
            soft = jax.nn.softmax(old_logits / lwf_T, axis=-1)
            lp = jax.nn.log_softmax(out.logits / lwf_T, axis=-1)
            loss = loss + lwf_lambda * _wmean(-jnp.sum(soft * lp, axis=-1),
                                              w)
        if weight_decay > 0:
            loss = loss + weight_decay_penalty(params, weight_decay)
        if consistency_coeff is not None and teacher_params is not None:
            if compute_dtype is not None:
                from nnal_tpu.models.cnn import cast_float_params

                teacher_params = cast_float_params(teacher_params,
                                                   compute_dtype)
            t_out = apply_cnn(spec, teacher_params, x)
            # cc_scale: labeled-count ramp-down factor (engine.common.
            # mt_rampdown) — traced, so per-round decay never recompiles
            coeff = consistency_coeff(step) * cc_scale
            loss = loss + coeff * consistency_loss(
                out.logits, t_out.logits, consistency_measure)
        return loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, x, y, rng, step, teacher_params=None,
                w=None, old_logits=None, cw=None, cc_scale=1.0):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, w, old_logits, rng, teacher_params, step, cw,
            cc_scale)
        grads = apply_grad_mask(grads, grad_mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn


def init_train_state(spec, params, optimizer_name="SGD", learning_rate=1e-3,
                     bn_state=None, mean_teacher: bool = False,
                     tx=None, **opt_kw) -> TrainState:
    """``tx`` lets callers reuse an optimizer across invocations: the
    engines key their jitted step/scan caches on ``id(tx)``, so a fresh
    optax transformation per ``run_method`` call would recompile the train
    program even at identical shapes."""
    if tx is None:
        tx = make_optimizer(optimizer_name, learning_rate, **opt_kw)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        bn_state=bn_state,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params)
        if mean_teacher else None,
    ), tx


def train(spec, state: TrainState, step_fn, train_gen, *, step_limit: int,
          rng, eval_every: int = 0, eval_fn: Optional[Callable] = None,
          metric_name: str = "valid", track_best: bool = False,
          ema_decay: float = 0.999):
    """Step-bounded loop (reference NN_extended.py:928-1008).

    ``train_gen`` yields ``(x, y)`` host batches; ``eval_fn(params) ->
    float`` is called every ``eval_every`` steps; when ``track_best`` the
    best-metric parameters are retained (the reference's
    ``max_model_pars.h5`` + ``max_valid_iter.txt``).
    Returns the final state (with ``metrics`` filled) and the best params.
    """
    best_params = None
    best_metric = -np.inf
    history = state.metrics.setdefault(metric_name, [])
    losses = state.metrics.setdefault("train_loss", [])

    while state.step < step_limit:
        x, y = next(train_gen)
        key = jax.random.fold_in(rng, state.step)
        state.params, state.opt_state, loss = step_fn(
            state.params, state.opt_state, jnp.asarray(x), jnp.asarray(y),
            key, jnp.asarray(state.step), state.teacher_params)
        losses.append(float(loss))
        if state.teacher_params is not None:
            state.teacher_params = ema_update(state.teacher_params,
                                              state.params, ema_decay)
        state.step += 1
        if eval_every and eval_fn and state.step % eval_every == 0:
            m = float(eval_fn(state.params))
            history.append(m)
            if track_best and m > best_metric:
                best_metric = m
                best_params = jax.tree_util.tree_map(np.asarray,
                                                     state.params)
    return state, (best_params if best_params is not None else state.params)


def make_scanned_finetune(spec, tx, *, batch_size: int,
                          grad_mask=None, mc_t: int = 10,
                          lwf_lambda: float = 0.0, lwf_T: float = 2.0,
                          compute_dtype=None,
                          consistency_coeff: float = 0.0,
                          consistency_measure: str = "CE",
                          consistency_ramp: int = 0,
                          ema_decay: float = 0.99):
    """Whole-epoch finetuning as ONE jitted ``lax.scan`` over a precomputed
    (steps, b) batch-index matrix into device-resident training patches.

    The per-batch Python loop costs one device dispatch per batch — on a
    tunneled TPU that latency dominates training.  Here the labeled set is
    gathered once per AL round and every epoch's steps run inside a single
    program.  Ragged tail batches are padded and masked with per-sample
    weights, which reproduces the plain mean over real samples exactly.
    Returns ``fn(params, opt_state, x_all, y_all, idx_mat, w_mat, cw, rng,
    [old_logits_all]) -> (params, opt_state, losses)``; ``cw`` is a
    per-class weight vector (traced, so per-round 'auto' weights never
    trigger recompiles).  With ``lwf_lambda > 0`` pass ``old_logits_all``
    (the previous model's logits over the same device-resident set,
    computed once per round) to add LwF distillation at temperature
    ``lwf_T`` (reference ``get_LwF``, model_utils.py:98-135).
    ``compute_dtype=bfloat16`` runs the scan mixed-precision (bf16
    forward/backward, f32 master params + optimizer state).

    ``consistency_coeff > 0`` builds the MEAN-TEACHER runner instead
    (reference MT_SSL, NN_extended.py:1337-1396: EMA teacher + consistency
    loss + sigmoid ramp-up): signature ``fn(params, opt_state, teacher,
    x_all, y_all, idx_mat, w_mat, cw, rng, step0, xu_all, u_idx_mat)
    -> (params, opt_state, teacher, losses)``.  Each step adds
    ``coeff(step0+i) * consistency(student(x_u, dropout), teacher(x_u))``
    over the unlabeled batch ``xu_all[u_idx_mat[i]]`` and EMA-updates the
    teacher AFTER the optimizer step — all inside the one scan, so MT-SSL
    costs zero extra dispatches.  ``consistency_ramp`` is the sigmoid
    ramp-up length in optimizer steps (0 = constant coefficient);
    ``step0`` is the global step at scan entry, so the ramp is continuous
    across AL rounds and bit-identical under crash-resume replay.
    """
    from nnal_tpu.models.optim import apply_grad_mask, ema_update
    from nnal_tpu.models.losses import (
        aleatoric_ce_per_sample,
        consistency_loss,
    )

    mt = consistency_coeff > 0.0

    def loss_fn(params, x, y, w, cw, ol, rng, teacher, x_u, coeff):
        params_c, x = _cast_for_forward(compute_dtype, params, x)
        out = apply_cnn(spec, params_c, x, train=True, dropout_rng=rng)
        if getattr(spec, "aleatoric", False):
            per = aleatoric_ce_per_sample(
                out.logits, out.log_sigma.astype(jnp.float32), y,
                jax.random.fold_in(rng, 1), mc_t)
        else:
            logp = jax.nn.log_softmax(out.logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
        per = per * jnp.sum(y * cw, axis=-1)
        loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        if lwf_lambda > 0.0 and ol is not None:
            soft = jax.nn.softmax(ol / lwf_T, axis=-1)
            lp = jax.nn.log_softmax(out.logits / lwf_T, axis=-1)
            dper = -jnp.sum(soft * lp, axis=-1)
            loss = loss + lwf_lambda * (jnp.sum(dper * w)
                                        / jnp.maximum(jnp.sum(w), 1.0))
        if mt:
            # student sees the unlabeled batch WITH dropout (its own key
            # chain, offset far outside the labeled fold range), the
            # teacher clean — the reference's noise asymmetry
            _, x_uc = _cast_for_forward(compute_dtype, params, x_u)
            s_out = apply_cnn(spec, params_c, x_uc, train=True,
                              dropout_rng=jax.random.fold_in(
                                  rng, (1 << 21) + 3))
            t_params, _ = _cast_for_forward(compute_dtype, teacher, x_u)
            t_out = apply_cnn(spec, t_params, x_uc)
            loss = loss + coeff * consistency_loss(
                s_out.logits, t_out.logits, consistency_measure)
        return loss

    if consistency_ramp > 0:
        from nnal_tpu.models.optim import sigmoid_rampup

        ramp = sigmoid_rampup(consistency_ramp)
    else:
        def ramp(t):
            return 1.0

    def _scan(params, opt_state, teacher, x_all, y_all, idx_mat, w_mat,
              cw, rng, step0, cc_scale, xu_all, u_idx_mat,
              old_logits_all):
        def step(carry, sc):
            params, opt_state, teacher = carry
            idx, uidx, w, i = sc
            x = x_all[idx]
            y = y_all[idx]
            x_u = None if xu_all is None else xu_all[uidx]
            # cc_scale: engine-supplied ramp-DOWN factor (reference
            # sigmoid_rampdown family, NN_extended.py:1462-1502) driven by
            # the labeled count — traced, so per-round decay never
            # recompiles the scan
            coeff = (consistency_coeff * cc_scale * ramp(step0 + i)) \
                if mt else 0.0
            ol = None if old_logits_all is None else old_logits_all[idx]
            key = jax.random.fold_in(rng, i)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, y, w, cw, ol, key, teacher, x_u, coeff)
            grads = apply_grad_mask(grads, grad_mask)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # all-masked padding steps are exact no-ops
            do = jnp.sum(w) > 0
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do, new, old), new_params,
                params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do, new, old), new_opt,
                opt_state)
            if mt:
                new_teacher = ema_update(teacher, params, ema_decay)
                teacher = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(do, new, old), new_teacher,
                    teacher)
            return (params, opt_state, teacher), loss

        steps = jnp.arange(idx_mat.shape[0])
        if u_idx_mat is None:
            u_idx_mat = jnp.zeros((idx_mat.shape[0], 1), jnp.int32)
        (params, opt_state, teacher), losses = jax.lax.scan(
            step, (params, opt_state, teacher),
            (idx_mat, u_idx_mat, w_mat, steps))
        return params, opt_state, teacher, losses

    if mt:
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def run_mt(params, opt_state, teacher, x_all, y_all, idx_mat,
                   w_mat, cw, rng, step0, cc_scale, xu_all, u_idx_mat,
                   old_logits_all=None):
            return _scan(params, opt_state, teacher, x_all, y_all,
                         idx_mat, w_mat, cw, rng, step0, cc_scale,
                         xu_all, u_idx_mat, old_logits_all)

        return run_mt

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, x_all, y_all, idx_mat, w_mat, cw, rng,
            old_logits_all=None):
        p, o, _, losses = _scan(params, opt_state, None, x_all, y_all,
                                idx_mat, w_mat, cw, rng, 0, 1.0, None,
                                None, old_logits_all)
        return p, o, losses

    return run


def make_scanned_finetune_fcn(spec, tx, *, batch_size: int,
                              compute_dtype=None, grad_mask=None,
                              consistency_coeff: float = 0.0,
                              consistency_measure: str = "CE",
                              consistency_ramp: int = 0,
                              ema_decay: float = 0.99):
    """Whole-round DENSE finetuning as one jitted ``lax.scan`` — the FCN
    analog of :func:`make_scanned_finetune` for the dense-model AL path.

    ``fn(params, opt_state, x_all, y_all, wpix_all, idx_mat, w_mat, rng)
    -> (params, opt_state, losses)`` where ``x_all`` is an (S, H, W, C)
    slice stack, ``y_all`` (S, H, W, nclass) one-hot labels and
    ``wpix_all`` (S, H, W) PER-PIXEL weights — in active learning only the
    queried voxels are labeled, so the CE is masked to exactly those
    pixels (the oracle's dense mask is never leaked); class weights can be
    folded into ``wpix_all`` by the caller.  ``idx_mat``/``w_mat`` batch
    slices exactly like the patch runner (padding steps are exact
    no-ops).  Reference analog: the v2 FCN train loop
    (NN_extended.py:928-1008) with get_FCN_loss masking.

    ``grad_mask`` enables partial training by layer (config
    ``train_layers``).  ``consistency_coeff > 0`` builds the MEAN-TEACHER
    runner (reference MT_SSL, NN_extended.py:1337-1396, applied densely):
    signature ``fn(params, opt_state, teacher, x_all, y_all, wpix_all,
    idx_mat, w_mat, rng, step0, cc_scale, xu_all, u_idx_mat) -> (params,
    opt_state, teacher, losses)`` — each step adds ``coeff *
    consistency(student(x_u, dropout), teacher(x_u))`` averaged over ALL
    pixels of the unlabeled slice batch ``xu_all[u_idx_mat[i]]`` (dense
    consistency needs no labels) and EMA-updates the teacher after the
    optimizer step, all inside the one scan."""
    from nnal_tpu.models.losses import consistency_loss
    from nnal_tpu.models.optim import apply_grad_mask, ema_update

    mt = consistency_coeff > 0.0

    def loss_fn(params, x, y, wpix, rng, teacher, x_u, coeff):
        params_c, x = _cast_for_forward(compute_dtype, params, x)
        out = apply_cnn(spec, params_c, x, train=True, dropout_rng=rng)
        logp = jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1)
        per = -jnp.sum(y * logp, axis=-1)            # (b, H, W)
        loss = jnp.sum(per * wpix) / jnp.maximum(jnp.sum(wpix), 1.0)
        if mt:
            # student sees the unlabeled slices WITH dropout, the teacher
            # clean (the reference noise asymmetry); per-pixel logits ->
            # consistency over every pixel
            _, x_uc = _cast_for_forward(compute_dtype, params, x_u)
            s_out = apply_cnn(spec, params_c, x_uc, train=True,
                              dropout_rng=jax.random.fold_in(
                                  rng, (1 << 21) + 3))
            t_params, _ = _cast_for_forward(compute_dtype, teacher, x_u)
            t_out = apply_cnn(spec, t_params, x_uc)
            s_l = s_out.logits.reshape(-1, s_out.logits.shape[-1])
            t_l = t_out.logits.reshape(-1, t_out.logits.shape[-1])
            loss = loss + coeff * consistency_loss(s_l, t_l,
                                                   consistency_measure)
        return loss

    if consistency_ramp > 0:
        from nnal_tpu.models.optim import sigmoid_rampup

        ramp = sigmoid_rampup(consistency_ramp)
    else:
        def ramp(t):
            return 1.0

    def _scan(params, opt_state, teacher, x_all, y_all, wpix_all,
              idx_mat, w_mat, rng, step0, cc_scale, xu_all, u_idx_mat):
        def step(carry, sc):
            params, opt_state, teacher = carry
            idx, uidx, w, i = sc
            x = x_all[idx]
            y = y_all[idx]
            x_u = None if xu_all is None else xu_all[uidx]
            coeff = (consistency_coeff * cc_scale * ramp(step0 + i)) \
                if mt else 0.0
            # zero out the padding rows' pixels so ragged batches are
            # exact no-ops (same contract as the patch runner's w)
            wpix = wpix_all[idx] * w[:, None, None]
            key = jax.random.fold_in(rng, i)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, y, wpix, key, teacher, x_u, coeff)
            grads = apply_grad_mask(grads, grad_mask)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            do = jnp.sum(wpix) > 0
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do, new, old), new_params,
                params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do, new, old), new_opt,
                opt_state)
            if mt:
                new_teacher = ema_update(teacher, params, ema_decay)
                teacher = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(do, new, old), new_teacher,
                    teacher)
            return (params, opt_state, teacher), loss

        steps = jnp.arange(idx_mat.shape[0])
        if u_idx_mat is None:
            u_idx_mat = jnp.zeros((idx_mat.shape[0], 1), jnp.int32)
        (params, opt_state, teacher), losses = jax.lax.scan(
            step, (params, opt_state, teacher),
            (idx_mat, u_idx_mat, w_mat, steps))
        return params, opt_state, teacher, losses

    if mt:
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def run_mt(params, opt_state, teacher, x_all, y_all, wpix_all,
                   idx_mat, w_mat, rng, step0, cc_scale, xu_all,
                   u_idx_mat):
            return _scan(params, opt_state, teacher, x_all, y_all,
                         wpix_all, idx_mat, w_mat, rng, step0, cc_scale,
                         xu_all, u_idx_mat)

        return run_mt

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, x_all, y_all, wpix_all, idx_mat, w_mat,
            rng):
        p, o, _, losses = _scan(params, opt_state, None, x_all, y_all,
                                wpix_all, idx_mat, w_mat, rng, 0, 1.0,
                                None, None)
        return p, o, losses

    return run


def build_batch_index_matrix(n: int, batch_size: int, epochs: int, rng,
                             bucket: int = 256):
    """(steps, b) index matrix + (steps, b) validity weights with the same
    shuffled partition semantics as ``gen_batch_inds`` (ragged tails padded
    with index 0, weight 0).

    Shapes are BUCKETED so the jitted scan compiles once per bucket rather
    than once per AL round: the step count is padded with all-masked no-op
    steps up to the count a ``bucket``-multiple-sized set would need.
    """
    from nnal_tpu.data.batching import gen_batch_inds

    rows, weights = [], []
    for _ in range(epochs):
        for batch in gen_batch_inds(n, batch_size, rng):
            pad = batch_size - len(batch)
            rows.append(np.concatenate([batch,
                                        np.zeros(pad, np.int64)]))
            weights.append(np.concatenate([np.ones(len(batch), np.float32),
                                           np.zeros(pad, np.float32)]))
    if bucket:
        n_bucket = int(-(-n // bucket)) * bucket
        steps_target = epochs * (-(-n_bucket // batch_size) + 1)
        while len(rows) < steps_target:
            rows.append(np.zeros(batch_size, np.int64))
            weights.append(np.zeros(batch_size, np.float32))
    return np.stack(rows), np.stack(weights)


def build_unlabeled_index_matrix(n_u: int, ub: int, steps: int, rng):
    """(steps, ub) with-replacement index matrix into the round's gathered
    unlabeled subset — the mean-teacher consistency batches.  Fixed shape
    by construction (sampling with replacement), so the MT scan compiles
    once per bucket like the labeled matrix."""
    return rng.integers(0, n_u, size=(steps, ub)).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _bn_refresh_fwd(spec, bn_decay):
    # cached per (spec, decay): a fresh jax.jit wrapper per call would
    # re-trace (and remote-recompile) the refresh program every AL round
    return jax.jit(lambda p, s, x: apply_cnn(spec, p, x, train=True,
                                             state=s,
                                             bn_decay=bn_decay).state)


def update_bn_stats(spec, params, bn_state, sample_gen, iters: int = 200,
                    bn_decay: float = 0.999):
    """Recompute BN running statistics over a sample generator without
    touching weights (reference ``update_BN_stats``,
    NN_extended.py:1059-1084: run only the UPDATE_OPS in training mode).
    ``sample_gen()`` yields ``x`` or ``(x, y)`` host batches.  Returns the
    refreshed BN state pytree.

    ``bn_decay`` is the refresh momentum: at the reference 0.999, the
    default 200 iterations move the moving averages ~18% of the way to
    the batch statistics — callers refreshing with a handful of batches
    should pass an aggressive decay (the dense engine uses 0.6 over 8)."""
    fwd = _bn_refresh_fwd(spec, float(bn_decay))
    state = bn_state
    for _ in range(iters):
        batch = sample_gen()
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        state = fwd(params, state, jnp.asarray(x))
    return state


def validated_train(spec, state: TrainState, step_fn, train_gen, *,
                    step_limit: int, rng, eval_fn, eval_every: int):
    """Validated training with best-weights rollback (reference
    ``validated_train``, NN.py:744): after the loop, parameters revert to
    the best validation point."""
    state, best = train(spec, state, step_fn, train_gen,
                        step_limit=step_limit, rng=rng,
                        eval_every=eval_every, eval_fn=eval_fn,
                        track_best=True)
    state.params = jax.tree_util.tree_map(jnp.asarray, best)
    return state
