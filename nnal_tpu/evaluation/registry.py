"""Multi-metric validation registries.

Rebuild of the v2 step-based eval harness (reference ``eval_metrics``,
eval_utils.py:16-102, and the per-generator metric streams of
``NN_extended.train``, NN_extended.py:940-990): each validation *registry*
owns a data generator and a set of metric names ('av_acc', 'F1',
'av_loss'); during training every registry is evaluated periodically, its
histories are appended and mirrored to ``<metric>_<i>.txt`` files, and an
optional tracked metric drives best-model checkpointing
(``max_model_pars`` + ``max_valid_iter.txt``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.evaluation.metrics import binary_f1, multi_f1
from nnal_tpu.models.cnn import apply_cnn


def eval_metrics(spec, params, dat_gen: Callable, iters: int = 50,
                 metrics: Sequence[str] = ("av_acc",)) -> Dict[str, float]:
    """One evaluation sweep: ``iters`` generator batches through the model,
    returning the requested metrics (reference ``eval_metrics``,
    eval_utils.py:16-102 — accuracy/F1 over concatenated predictions,
    loss as a size-weighted running average)."""
    fwd = jax.jit(lambda p, x: apply_cnn(spec, p, x))
    all_preds, all_masks = [], []
    av_loss, vol = 0.0, 0
    for _ in range(iters):
        batch_x, batch_y = dat_gen()
        b = batch_x.shape[0]
        out = fwd(params, jnp.asarray(batch_x))
        y = np.asarray(batch_y)
        y_lab = y.argmax(-1) if y.ndim == out.posteriors.ndim else y
        preds = np.asarray(out.prediction)
        all_preds.append(preds)
        all_masks.append(y_lab)
        if "av_loss" in metrics:
            logp = np.asarray(jax.nn.log_softmax(out.logits, axis=-1))
            onehot = y if y.ndim == logp.ndim else np.eye(
                logp.shape[-1])[y_lab]
            loss = float(-np.mean(np.sum(onehot * logp, axis=-1)))
            av_loss = (vol * av_loss + loss * b) / (vol + b)
        vol += b
    preds = np.concatenate(all_preds).ravel()
    masks = np.concatenate(all_masks).ravel()
    out: Dict[str, float] = {}
    for m in metrics:
        if m == "av_acc":
            out[m] = float(np.mean(preds == masks))
        elif m == "F1":
            out[m] = (binary_f1(preds, masks) if spec.nclass == 2
                      else multi_f1(preds, masks, spec.nclass)[1])
        elif m == "av_loss":
            out[m] = av_loss
        else:
            raise ValueError(f"unknown metric {m!r}")
    return out


@dataclass
class MetricRegistry:
    """One validation generator + its metric set (the reference's
    ``valid_metrics_<i>`` dict + ``<metric>_<i>.txt`` persistence)."""

    metrics: Sequence[str]
    gen: Callable
    iters: int = 10
    history: Dict[str, List[float]] = field(default_factory=dict)

    def evaluate(self, spec, params) -> Dict[str, float]:
        vals = eval_metrics(spec, params, self.gen, self.iters,
                            tuple(self.metrics))
        for m, v in vals.items():
            self.history.setdefault(m, []).append(v)
        return vals

    def persist(self, save_path: str, idx: int) -> None:
        for m, hist in self.history.items():
            np.savetxt(os.path.join(save_path, f"{m}_{idx}.txt"), hist)

    def load(self, save_path: str, idx: int) -> None:
        for m in self.metrics:
            p = os.path.join(save_path, f"{m}_{idx}.txt")
            if os.path.exists(p):
                self.history[m] = list(np.atleast_1d(np.loadtxt(p)))


def train_with_registries(spec, state, step_fn, train_gen, *,
                          step_limit: int, rng,
                          registries: Sequence[MetricRegistry],
                          eval_every: int = 50,
                          save_path: Optional[str] = None,
                          track: Optional[str] = None,
                          ema_decay: float = 0.999):
    """Step-bounded training with per-registry metric streams (reference
    ``NN_extended.train``, NN_extended.py:928-1008).  When ``track`` names
    a metric of registry 0, the best-so-far parameters are checkpointed to
    ``max_model_pars.npz`` + ``max_valid_iter.txt``.  Resumes metric
    histories from ``save_path`` when the txt streams exist."""
    from nnal_tpu.models.checkpoint import save_checkpoint
    from nnal_tpu.models.optim import ema_update

    if save_path:
        os.makedirs(save_path, exist_ok=True)
        for i, reg in enumerate(registries):
            reg.load(save_path, i)

    def run_evals():
        for i, reg in enumerate(registries):
            reg.evaluate(spec, state.params)
            if save_path:
                reg.persist(save_path, i)
        if track and registries:
            V = registries[0].history.get(track, [])
            if V and (len(V) == 1 or V[-1] > max(V[:-1])):
                if save_path:
                    np.savetxt(os.path.join(save_path,
                                            "max_valid_iter.txt"),
                               [state.step])
                    save_checkpoint(
                        os.path.join(save_path, "max_model_pars.npz"),
                        state.params, bn_state=state.bn_state,
                        teacher_params=state.teacher_params)
                return True
        return False

    while state.step < step_limit:
        if state.step % eval_every == 0:
            run_evals()
        x, y = next(train_gen)
        key = jax.random.fold_in(rng, state.step)
        state.params, state.opt_state, loss = step_fn(
            state.params, state.opt_state, jnp.asarray(x), jnp.asarray(y),
            key, jnp.asarray(state.step), state.teacher_params)
        state.metrics.setdefault("train_loss", []).append(float(loss))
        if state.teacher_params is not None:
            state.teacher_params = ema_update(state.teacher_params,
                                              state.params, ema_decay)
        state.step += 1

    if state.bn_state:
        # refresh BN running statistics over the training stream (the
        # reference's update_BN_stats pass, NN_extended.py:1059-1084) so
        # eval-mode inference runs on current moving averages rather than
        # per-batch statistics
        from nnal_tpu.models.train import update_bn_stats

        state.bn_state = update_bn_stats(
            spec, state.params, state.bn_state,
            lambda: next(train_gen), iters=20)
    run_evals()
    return state
