"""Single-subject patch-wise AL experiment.

Rebuild of ``PW_AL.Experiment`` (PW_AL.py:29-583): the root directory holds
``parameters.txt`` (YAML config), pool/test index files, and one
subdirectory per querying method with membership files, a ``queries/``
journal, per-round F-measure appends and weight checkpoints.  The AL loop
per round: query -> move queries from pool to train -> finetune -> predict
test -> append F-measure -> checkpoint (reference run_method,
PW_AL.py:278-498).  Crash-resume replays the ``queries/`` journal plus the
atomic ``state.json`` record (SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.core.journal import MethodJournal, load_inds, save_inds
from nnal_tpu.core.rng import RngStream
from nnal_tpu.data.batching import gen_batch_inds, make_onehot
from nnal_tpu.data.patches import (
    gather_labels,
    gather_patches_normalized,
    pad_volumes,
)
from nnal_tpu.data.samplers import even_odd_slice_split, generate_grid_samples
from nnal_tpu.data.stats import multimg_stats
from nnal_tpu.evaluation.metrics import f_measure
from nnal_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model
from nnal_tpu.models.train import init_train_state
from nnal_tpu.scoring.pool_eval import PoolEvaluator, eval_compute_dtype
from nnal_tpu.scoring.strategies import QueryContext, cnn_query


class PWExperiment:
    """Patch-wise AL experiment over one subject's volumes."""

    def __init__(self, root_dir: str, config: Optional[ExperimentConfig] = None):
        self.root_dir = root_dir
        os.makedirs(root_dir, exist_ok=True)
        par_path = os.path.join(root_dir, "parameters.txt")
        if config is None:
            config = ExperimentConfig.from_yaml(par_path)
        else:
            config.to_yaml(par_path)
        self.config = config
        self.rng = RngStream(config.seed)
        self._vols: Optional[List[np.ndarray]] = None
        self._mask: Optional[np.ndarray] = None
        # ensemble/QBC-JS committee: list of checkpoint paths (reference
        # pretrained_paths + model_holder, PW_AL.py:780-845)
        self.ensemble_paths: List[str] = []

    # ------------------------------------------------------------- data
    def attach_subject(self, vols, mask) -> None:
        """Provide the subject volumes in memory (tests/synthetic) — the
        path-based alternative loads via ``config.data.img_paths``."""
        self._vols = [np.asarray(v) for v in vols]
        self._mask = np.asarray(mask)

    def _load_subject(self):
        if self._vols is None:
            from nnal_tpu.data.io import read_volume

            self._vols = [read_volume(p) for p in self.config.data.img_paths]
            self._mask = read_volume(self.config.data.mask_path)
        return self._vols, self._mask

    def prep_data(self) -> None:
        """Grid-sample the subject; even axial slices feed the pool, the
        full grid is the test set (reference ``prep_AL_data``,
        PW_AL.py:978-1027).  NaN-masked voxels are discarded."""
        vols, mask = self._load_subject()
        inds, labels = generate_grid_samples(
            vols[0].shape, self.config.data.grid_spacing, mask)
        pool_inds, test_inds = even_odd_slice_split(inds, vols[0].shape)
        lab_of = dict(zip(inds.tolist(), labels.tolist()))
        save_inds(self._p("init_pool_inds.txt"), pool_inds)
        save_inds(self._p("init_pool_labels.txt"),
                  [lab_of[i] for i in pool_inds.tolist()])
        save_inds(self._p("test_inds.txt"), test_inds)
        save_inds(self._p("test_labels.txt"),
                  [lab_of[i] for i in test_inds.tolist()])
        stats = multimg_stats([(vols, mask)])
        np.savetxt(self._p("train_stats.txt"), stats)

    def _p(self, name: str) -> str:
        return os.path.join(self.root_dir, name)

    # ------------------------------------------------------------- model
    def build_model(self):
        m = self.config.model
        d1, d2, d3 = m.patch_shape
        vols = self._load_subject()[0]
        nmod = len(vols)
        if m.model_name in ("Tiramisu", "FCDenseNet103"):
            # dense-model AL path: the FCN consumes whole axial slices
            # (H, W, modalities); size knobs (growth/depths) ride
            # model_kwargs (reference FCDenseNet_103Layers,
            # create_NN.py:211)
            H, W, _ = np.asarray(vols[0]).shape
            kw = dict(getattr(m, "model_kwargs", None) or {})
            kw.setdefault("dropout_rate", m.dropout_rate)
            if "depths" in kw:
                kw["depths"] = tuple(kw["depths"])
            spec = create_model(m.model_name, nclass=m.nclass,
                                input_shape=(int(H), int(W), nmod), **kw)
        else:
            spec = create_model(m.model_name, nclass=m.nclass,
                                dropout_rate=m.dropout_rate,
                                patch_shape=(d1, d2, nmod * d3))
        if getattr(m, "aleatoric", False):
            from nnal_tpu.models.specs import with_aleatoric_head

            spec = with_aleatoric_head(spec)
        return spec

    def _stats_arrays(self):
        stats = np.loadtxt(self._p("train_stats.txt")).reshape(1, -1)
        mu = stats[0, 0::2]
        sd = stats[0, 1::2]
        return mu, sd

    def make_evaluator(self, spec) -> PoolEvaluator:
        vols, _ = self._load_subject()
        mu, sd = self._stats_arrays()
        patch_shape = tuple(self.config.model.patch_shape)
        cd = eval_compute_dtype(self.config.model.dtype)
        if getattr(spec, "fcn", False):
            # dense models score the pool by whole-slice sweeps + gather —
            # no patch extraction (scoring/fcn_eval.py)
            from nnal_tpu.scoring.fcn_eval import FCNGridPoolEvaluator

            return FCNGridPoolEvaluator(spec, vols, mu, sd,
                                        tuple(np.asarray(vols[0]).shape),
                                        compute_dtype=cd)
        padded = pad_volumes(vols, patch_shape)
        # grid pools sweep via im2col — the fast TPU path; d3 > 1 rides
        # it too via z-neighbor channel stacking (grid_eval docstring)
        from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

        args = (spec, padded, mu, sd, patch_shape, tuple(vols[0].shape))
        kw = dict(grid_spacing=self.config.data.grid_spacing,
                  ntb=self.config.query.ntb, compute_dtype=cd)
        dp = int(getattr(self.config.query, "data_parallel", 1))
        if dp > 1:
            # config-driven multi-chip pool scoring (driver config #5):
            # the sharded evaluator is a drop-in, selections bit-identical
            from nnal_tpu.parallel.grid_sharded import (
                ShardedGridPoolEvaluator,
            )
            from nnal_tpu.parallel.mesh import cached_mesh

            return ShardedGridPoolEvaluator(cached_mesh(dp), *args, **kw)
        return GridPoolEvaluator(*args, **kw)

    # ------------------------------------------------------------- methods
    def add_method(self, method_name: str, init_size: Optional[int] = None):
        """Create a method directory with initial pool/train membership and
        fresh (or shared-init) weights (reference ``add_method``,
        PW_AL.py:230-276)."""
        j = MethodJournal(self.root_dir, method_name)
        pool = load_inds(self._p("init_pool_inds.txt"))
        init_size = (self.config.query.init_size
                     if init_size is None else init_size)
        host = self.rng.fold(f"init-{method_name}").host
        if init_size > 0:
            pick = host.permutation(len(pool))[:init_size]
            train = pool[pick]
            pool = np.delete(pool, pick)
        else:
            train = np.zeros(0, dtype=np.int64)
        j.init_membership(train, pool)

        spec = self.build_model()
        init_w = self._p("init_weights.npz")
        if not os.path.exists(init_w):
            params, bn = init_cnn(spec, self.rng.fold("init-weights").next())
            save_checkpoint(init_w, params, bn_state=bn)
        params, bn, _, _ = load_checkpoint(init_w)
        save_checkpoint(j.path("curr_weights.npz"), params, bn_state=bn)
        return j

    def _cached_tx(self):
        from nnal_tpu.engine.common import cached_tx

        return cached_tx(self, self.config.model)

    # ------------------------------------------------------------- training
    def finetune(self, spec, params_state, train_inds, *, epochs=None,
                 rng_tag: str = ""):
        """Finetune on the labeled set (reference ``finetune``,
        PW_AL.py:1030-1089).

        TPU-native shape: the labeled set is gathered + normalized ONCE,
        then every epoch's batches run inside a single jitted ``lax.scan``
        (one device dispatch per AL round instead of one per batch — the
        per-dispatch latency dominated training on tunneled TPUs)."""
        from nnal_tpu.models.train import (
            build_batch_index_matrix,
            make_scanned_finetune,
        )

        # donation guard: the scanned runner donates params/opt buffers,
        # which must not be mid-flight in an async checkpoint pull
        # (normally a no-op — run_method waits right after selection)
        w = getattr(self, "_ckpt_writer", None)
        if w is not None:
            w.wait()

        m = self.config.model
        from nnal_tpu.engine.common import maybe_reset_opt

        maybe_reset_opt(params_state[0], params_state[1], m)
        if getattr(spec, "fcn", False):
            return self._finetune_fcn(spec, params_state, train_inds,
                                      epochs=epochs, rng_tag=rng_tag)
        vols, mask = self._load_subject()
        mu, sd = self._stats_arrays()
        state, tx = params_state
        grad_mask = None
        if m.train_layers:
            # partial training by layer name (reference train_mask /
            # var_list filtering, NN.py:557, NN_extended.py:1398)
            from nnal_tpu.models.optim import layer_train_mask

            grad_mask = layer_train_mask(state.params, m.train_layers)
        orig_shape = tuple(vols[0].shape)
        labels_all = np.asarray(gather_labels(mask, train_inds, orig_shape))
        cw = getattr(m, "class_weights", None)
        if isinstance(cw, str) and cw == "auto":
            # inverse-frequency weights over the current labeled set
            # (reference class-cost weighting, PW_AL.py:1060-1088 one-hots
            # weighted by class costs)
            counts = np.bincount(labels_all.astype(np.int64),
                                 minlength=m.nclass).astype(np.float64)
            inv = counts.sum() / np.maximum(counts, 1.0)
            cw = (inv / inv.sum() * m.nclass).astype(np.float32)

        padded = pad_volumes(vols, m.patch_shape)
        # derive per-call streams from the replay-stable optimizer step so a
        # crash-resumed campaign shuffles/drops identically to an
        # uninterrupted one (no long-lived child cursor to lose)
        host = self.rng.fold(f"finetune-{rng_tag}{state.step}").host
        jrng = self.rng.fold(f"finetune-dropout-{rng_tag}{state.step}").next()
        epochs = m.epochs if epochs is None else epochs
        if len(train_inds) == 0 or epochs == 0:
            return state

        # bucket the gathered set so shapes (and hence compiles) are stable
        # across AL rounds as the labeled set grows
        bucket = 256
        n = len(train_inds)
        n_bucket = -(-n // bucket) * bucket
        tr = np.concatenate([np.asarray(train_inds, np.int64),
                             np.zeros(n_bucket - n, np.int64)])
        x_all = gather_patches_normalized(
            padded, jnp.asarray(tr), mu, sd, tuple(m.patch_shape),
            orig_shape)
        y_pad = np.concatenate([labels_all,
                                np.zeros(n_bucket - n, np.int64)])
        y_all = jnp.asarray(make_onehot(y_pad, m.nclass))
        idx_mat, w_mat = build_batch_index_matrix(n, m.b, epochs, host,
                                                  bucket=bucket)

        # cache the jitted runner: a fresh closure per round would recompile
        # every AL round even at identical shapes
        lwf_lambda = float(getattr(m, "lwf_lambda", 0.0))
        lwf_T = float(getattr(m, "lwf_T", 2.0))
        train_cd = eval_compute_dtype(getattr(m, "train_dtype", None))
        from nnal_tpu.engine.common import mt_rampdown

        cc, cc_scale = mt_rampdown(m, n)
        mt_kw = {}
        if cc > 0.0:
            mt_kw = dict(consistency_coeff=cc,
                         consistency_measure=str(
                             getattr(m, "consistency_measure", "CE")),
                         consistency_ramp=int(
                             getattr(m, "consistency_ramp", 0)),
                         ema_decay=float(getattr(m, "ema_decay", 0.99)))
        cache = getattr(self, "_ft_runners", None)
        if cache is None:
            cache = self._ft_runners = {}
        # key on the mask CONTENTS (train_layers), not just its presence:
        # modify_parameters(train_layers=...) between finetunes must not
        # reuse a runner closed over the stale layer mask
        ck = (id(tx), m.b, tuple(m.train_layers or ()), lwf_lambda, lwf_T,
              train_cd, tuple(sorted(mt_kw.items())))
        if ck not in cache:
            cache[ck] = make_scanned_finetune(spec, tx, batch_size=m.b,
                                              grad_mask=grad_mask,
                                              mc_t=int(m.mc_t),
                                              lwf_lambda=lwf_lambda,
                                              lwf_T=lwf_T,
                                              compute_dtype=train_cd,
                                              **mt_kw)
        run = cache[ck]
        cw_vec = jnp.ones((m.nclass,), jnp.float32) if cw is None \
            else jnp.asarray(cw, jnp.float32)
        key = jax.random.fold_in(jrng, state.step)
        old_logits = None
        if lwf_lambda > 0.0:
            # record the previous model's logits over the labeled set ONCE
            # per round; the scan distills against these rows per batch
            # (reference get_LwF, model_utils.py:98-135)
            fwd = getattr(self, "_lwf_fwd", None)
            if fwd is None:
                from nnal_tpu.models.cnn import apply_cnn

                fwd = self._lwf_fwd = jax.jit(
                    lambda p, x: apply_cnn(spec, p, x).logits)
            old_logits = fwd(state.params, x_all)
        if cc > 0.0:
            # mean-teacher: EMA teacher persists on the train state across
            # rounds (and through the anchors' teacher/ group); unlabeled
            # consistency batches are drawn from the INITIAL pool with a
            # step-keyed stream so replay is bit-identical
            from nnal_tpu.models.train import build_unlabeled_index_matrix

            if state.teacher_params is None:
                state.teacher_params = jax.tree_util.tree_map(
                    jnp.copy, state.params)
            u_pool = getattr(self, "_mt_u_pool", None)
            if u_pool is None:
                u_pool = self._mt_u_pool = load_inds(
                    self._p("init_pool_inds.txt"))
            uhost = self.rng.fold(
                f"finetune-unlab-{rng_tag}{state.step}").host
            n_take = 256
            u_sub = u_pool[uhost.integers(0, len(u_pool), size=n_take)]
            xu_all = gather_patches_normalized(
                padded, jnp.asarray(np.asarray(u_sub, np.int64)), mu, sd,
                tuple(m.patch_shape), orig_shape)
            ub = int(getattr(m, "unlabeled_batch", 0)) or m.b
            u_idx = build_unlabeled_index_matrix(
                n_take, ub, idx_mat.shape[0], uhost)
            (state.params, state.opt_state, state.teacher_params,
             losses) = run(
                state.params, state.opt_state, state.teacher_params,
                x_all, y_all, jnp.asarray(idx_mat), jnp.asarray(w_mat),
                cw_vec, key, jnp.asarray(state.step, jnp.float32),
                jnp.asarray(cc_scale, jnp.float32),
                xu_all, jnp.asarray(u_idx), old_logits)
        elif old_logits is not None:
            state.params, state.opt_state, losses = run(
                state.params, state.opt_state, x_all, y_all,
                jnp.asarray(idx_mat), jnp.asarray(w_mat), cw_vec, key,
                old_logits)
        else:
            state.params, state.opt_state, losses = run(
                state.params, state.opt_state, x_all, y_all,
                jnp.asarray(idx_mat), jnp.asarray(w_mat), cw_vec, key)
        state.step += int(idx_mat.shape[0])
        return state

    def _finetune_fcn(self, spec, params_state, train_inds, *,
                      epochs=None, rng_tag: str = ""):
        """Dense-model finetune: whole axial slices with the CE masked to
        exactly the queried voxels (active learning never leaks the
        oracle's dense mask).  One jitted scan per round, same
        replay-stable RNG/step discipline as the patch path."""
        from nnal_tpu.data.batching import make_onehot
        from nnal_tpu.models.train import (
            build_batch_index_matrix,
            make_scanned_finetune_fcn,
        )

        m = self.config.model
        state, tx = params_state
        epochs = m.epochs if epochs is None else epochs
        if len(train_inds) == 0 or epochs == 0:
            return state
        from nnal_tpu.engine.common import warn_fcn_unsupported_keys

        warn_fcn_unsupported_keys(self, m)
        vols, mask = self._load_subject()
        mu, sd = self._stats_arrays()
        H, W, Z = np.asarray(vols[0]).shape

        # normalized (Z, H, W, C) slice stack, cached per subject
        slices = getattr(self, "_fcn_slices", None)
        if slices is None:
            stack = np.stack([(np.asarray(v, np.float32) - mm) / ss
                              for v, mm, ss in zip(vols, np.ravel(mu),
                                                   np.ravel(sd))],
                             axis=-1)
            slices = self._fcn_slices = np.transpose(stack, (2, 0, 1, 3))

        x_, y_, z_ = np.unravel_index(np.asarray(train_inds, np.int64),
                                      (H, W, Z))
        lab = np.asarray(mask).reshape(-1)[np.asarray(train_inds,
                                                      np.int64)]
        zs = np.unique(z_)
        S = len(zs)
        s_bucket = -(-S // 8) * 8        # shape-stability: slice-count
        z_pad = np.concatenate([zs, np.full(s_bucket - S, zs[0],
                                            np.int64)])
        x_all = jnp.asarray(slices[z_pad])
        y_vol = np.zeros((s_bucket, H, W), np.int64)
        wpix = np.zeros((s_bucket, H, W), np.float32)
        zpos = {int(zv): i for i, zv in enumerate(zs)}
        cw = getattr(m, "class_weights", None)
        if isinstance(cw, str) and cw == "auto":
            counts = np.bincount(lab.astype(np.int64),
                                 minlength=m.nclass).astype(np.float64)
            inv = counts.sum() / np.maximum(counts, 1.0)
            cw = (inv / inv.sum() * m.nclass).astype(np.float32)
        for xi, yi, zi, li in zip(x_, y_, z_, lab.astype(np.int64)):
            si = zpos[int(zi)]
            y_vol[si, xi, yi] = li
            wpix[si, xi, yi] = 1.0 if cw is None else float(cw[li])
        y_all = jnp.asarray(make_onehot(y_vol.reshape(-1), m.nclass)
                            .reshape(s_bucket, H, W, m.nclass))
        wpix_all = jnp.asarray(wpix)

        host = self.rng.fold(f"finetune-{rng_tag}{state.step}").host
        jrng = self.rng.fold(
            f"finetune-dropout-{rng_tag}{state.step}").next()
        fcn_b = max(1, min(int(m.b), 4))   # slices are whole images
        idx_mat, w_mat = build_batch_index_matrix(S, fcn_b, epochs, host,
                                                  bucket=8)
        from nnal_tpu.scoring.pool_eval import eval_compute_dtype

        train_cd = eval_compute_dtype(getattr(m, "train_dtype", None))
        from nnal_tpu.engine.common import mt_rampdown

        cc, cc_scale = mt_rampdown(m, len(train_inds))
        mt_kw = {}
        if cc > 0.0:
            mt_kw = dict(consistency_coeff=cc,
                         consistency_measure=str(
                             getattr(m, "consistency_measure", "CE")),
                         consistency_ramp=int(
                             getattr(m, "consistency_ramp", 0)),
                         ema_decay=float(getattr(m, "ema_decay", 0.99)))
        grad_mask = None
        if m.train_layers:
            from nnal_tpu.models.optim import layer_train_mask

            grad_mask = layer_train_mask(state.params, m.train_layers)
        cache = getattr(self, "_ft_runners", None)
        if cache is None:
            cache = self._ft_runners = {}
        ck = (id(tx), "fcn", fcn_b, train_cd,
              tuple(m.train_layers or ()), tuple(sorted(mt_kw.items())))
        if ck not in cache:
            cache[ck] = make_scanned_finetune_fcn(spec, tx,
                                                  batch_size=fcn_b,
                                                  compute_dtype=train_cd,
                                                  grad_mask=grad_mask,
                                                  **mt_kw)
        run = cache[ck]
        key = jax.random.fold_in(jrng, state.step)
        if cc > 0.0:
            # dense mean-teacher: unlabeled whole slices from the SUBJECT
            # volume (dense consistency needs no labels — every pixel
            # participates); step-keyed stream -> replay bit-identical
            from nnal_tpu.models.train import build_unlabeled_index_matrix

            if state.teacher_params is None:
                state.teacher_params = jax.tree_util.tree_map(
                    jnp.copy, state.params)
            uhost = self.rng.fold(
                f"finetune-unlab-{rng_tag}{state.step}").host
            n_u = min(16, slices.shape[0])
            u_z = uhost.integers(0, slices.shape[0], size=n_u)
            xu_all = jnp.asarray(slices[u_z])
            ub = max(1, min(int(getattr(m, "unlabeled_batch", 0))
                            or fcn_b, 4))
            u_idx = build_unlabeled_index_matrix(
                n_u, ub, idx_mat.shape[0], uhost)
            (state.params, state.opt_state, state.teacher_params,
             _) = run(
                state.params, state.opt_state, state.teacher_params,
                x_all, y_all, wpix_all, jnp.asarray(idx_mat),
                jnp.asarray(w_mat), key,
                jnp.asarray(state.step, jnp.float32),
                jnp.asarray(cc_scale, jnp.float32), xu_all,
                jnp.asarray(u_idx))
        else:
            state.params, state.opt_state, _ = run(
                state.params, state.opt_state, x_all, y_all, wpix_all,
                jnp.asarray(idx_mat), jnp.asarray(w_mat), key)
        state.step += int(idx_mat.shape[0])
        if state.bn_state:
            # refresh BN running statistics over the training slices
            # (reference update_BN_stats, NN_extended.py:1059-1084):
            # the scan trains on BATCH stats and never touches the
            # moving averages, so without this the evaluator would
            # normalize with the INIT statistics — at campaign scale
            # that froze dense predictions at the all-positive F
            from nnal_tpu.models.train import _bn_refresh_fwd

            # decay 0.6: 8 batches converge the moving averages to the
            # batch-statistic mean (the 0.999 training decay moves them
            # 0.8% in 8 updates — the evaluator was still normalizing
            # with the INIT statistics, freezing dense predictions)
            bnfwd = _bn_refresh_fwd(spec, 0.6)
            bn = state.bn_state
            for _ in range(8):
                bi = host.integers(0, S, size=fcn_b)
                bn = bnfwd(state.params, bn, x_all[jnp.asarray(bi)])
            state.bn_state = bn
        return state

    # ------------------------------------------------------------- replay
    def _replay_to_round(self, j, spec, params_state, al_state,
                         train_inds, round_id):
        """Rebuild training state at ``round_id`` from an anchor checkpoint
        by re-running the journaled rounds' finetunes (bit-identical; see
        ``engine.common.replay_prefix_lens``).

        Under ``ckpt_dtype=bfloat16`` the live process ADOPTS bf16-rounded
        state at every anchor round — those roundings are part of the
        training trajectory, so replay re-applies them at the same rounds
        (a crash can land between the adoption and its save; without this
        the replayed trajectory diverges at bf16 ulp scale)."""
        from nnal_tpu.engine.common import (
            adopt_anchor_rounding,
            replay_prefix_lens,
        )

        state, tx = params_state
        K = max(1, int(getattr(self.config.model, "ckpt_full_every", 1)))
        anchor = (0 if al_state is None
                  else int(al_state.get("round", round_id)))
        for i, ln in enumerate(replay_prefix_lens(j, al_state, round_id,
                                                  len(train_inds))):
            state = self.finetune(spec, (state, tx), train_inds[:ln])
            if (anchor + i + 1) % K == 0:
                adopt_anchor_rounding(state, self.config.model)
        return state

    # ------------------------------------------------------------- AL loop
    def run_method(self, method_name: str, max_queries: int) -> Dict:
        """The AL loop (reference ``run_method``, PW_AL.py:278-498),
        resumable: replayed queries count toward ``max_queries``."""
        import time

        cfg = self.config
        j = MethodJournal(self.root_dir, method_name)
        spec = self.build_model()
        vols, mask = self._load_subject()
        orig_shape = tuple(vols[0].shape)
        evaluator = self.make_evaluator(spec)
        test_inds = load_inds(self._p("test_inds.txt"))
        test_labels = load_inds(self._p("test_labels.txt"))

        from nnal_tpu.models.checkpoint import restore_opt_state

        ckpt = j.path("curr_weights.npz")
        params, bn, teacher, al_state = load_checkpoint(ckpt)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state, tx = init_train_state(
            spec, params, cfg.model.optimizer_name, cfg.model.learning_rate,
            bn_state=bn, tx=self._cached_tx())
        self._tx = tx
        if teacher is not None:
            # MT-SSL: the EMA teacher is part of the resume point
            state.teacher_params = jax.tree_util.tree_map(jnp.asarray,
                                                          teacher)
        # resume mid-campaign with the exact optimizer moments + step
        state.opt_state = restore_opt_state(ckpt, state.opt_state)
        if al_state is not None:
            state.step = int(al_state.get("step", 0))

        saved = j.load_state()
        if saved is not None:
            self.rng.restore(saved["rng"])
        n_queries = j.n_queried()
        round_id = len(j.query_iters())

        train_inds, pool_inds = j.membership()
        from nnal_tpu.engine.common import reconcile_membership

        train_inds, pool_inds, _ = reconcile_membership(j, train_inds,
                                                        pool_inds)

        # ckpt_full_every > 1: the checkpoint on disk may be an *anchor*
        # from an earlier round (full saves are skipped in between).
        # Queries are journaled and each round's labeled set is a prefix
        # of the current one, so replaying the skipped rounds' finetunes
        # (step-keyed RNG) rebuilds this round's state bit-identically.
        state = self._replay_to_round(j, spec, (state, tx), al_state,
                                      train_inds, round_id)
        if hasattr(evaluator, "bn_state"):
            # BN-bearing dense specs score on the resumed running stats —
            # synced AFTER the replay: the replayed finetunes re-center
            # bn_state (decay-0.6 refresh), so a pre-replay sync would
            # leave the first post-resume selection on the anchor's stale
            # statistics, breaking bit-identical crash-resume
            evaluator.bn_state = state.bn_state

        from nnal_tpu.core.profiling import PhaseTimer
        from nnal_tpu.core.tb import TBWriter

        timer = PhaseTimer(j.path("phases.jsonl"))
        from nnal_tpu.models.checkpoint import AsyncCheckpointWriter

        if getattr(self, "_ckpt_writer", None) is None:
            self._ckpt_writer = AsyncCheckpointWriter()
        # optional TensorBoard mirror of the txt/JSONL metric streams
        tb = TBWriter(getattr(cfg, "tb_logdir", None)
                      and os.path.join(str(getattr(cfg, "tb_logdir")),
                                       method_name))
        # entry state is reproducible as-is (anchor ckpt or replay above)
        last_full_round = round_id

        # pool guard: without it an exhausted pool yields k=0 rounds that
        # query nothing and never reach max_queries (infinite loop)
        while n_queries < max_queries and len(pool_inds) > 0:
            t0 = time.time()
            k = min(cfg.query.k, max_queries - n_queries, len(pool_inds))
            if cfg.query.iter_k:
                k = min(k, cfg.query.iter_k[min(round_id,
                                                len(cfg.query.iter_k) - 1)])
            if k <= 0:
                # an iter_k schedule ending in 0 means "stop querying" —
                # without this break the loop spins forever (same defect
                # class as the empty-pool guard above)
                break
            # per-round stateless stream: replayable from (seed, method,
            # round) alone, so a resumed process queries identically
            qrng = self.rng.fold(f"query-{method_name}-{round_id}")
            if method_name in ("ensemble", "QBC-JS"):
                with timer.phase("committee"):
                    committee = self._build_committee(spec, state, tx,
                                                      train_inds, round_id)
            else:
                committee = self._ensemble_params()
            ctx = QueryContext(
                spec=spec, params=state.params, evaluator=evaluator,
                pool_inds=pool_inds, k=k, rng=qrng.host,
                jax_rng=qrng.next(), B=cfg.query.B,
                MC_iters=cfg.query.MC_iters, lambda_=cfg.query.lambda_,
                diag_load=float(getattr(cfg.query, "diag_load", 1e-5)),
                train_inds=train_inds, raw_volume=vols[0],
                ensemble_params=committee,
                extra={"mask": mask,
                       "overseg": getattr(self, "_overseg", None),
                       "gaussian_noise_std": cfg.model.gaussian_noise_std,
                       "rotation_angle": cfg.model.rotation_angle,
                       "output_perturbation_measure":
                           cfg.model.output_perturbation_measure,
                       "influence_mode": cfg.query.influence_mode,
                       "arnoldi_rank": cfg.query.arnoldi_rank})
            with timer.phase("score_select"):
                q_pos = cnn_query(ctx, method_name)
            with timer.phase("checkpoint"):
                # previous round's async save overlapped the scoring above;
                # it must be durable before this round writes any state
                self._ckpt_writer.wait()
            if ctx.extra.get("overseg") is not None:
                # SLIC oversegmentation depends only on the volume — cache
                # it across rounds instead of re-segmenting every query
                self._overseg = ctx.extra["overseg"]
            q_inds = pool_inds[q_pos]

            # bookkeeping: journal then membership (replayable order)
            j.record_queries(round_id, q_inds)
            train_inds = np.concatenate([train_inds, q_inds])
            pool_inds = np.delete(pool_inds, q_pos)
            j.init_membership(train_inds, pool_inds)
            n_queries += len(q_inds)
            round_id += 1

            # finetune on the enlarged labeled set
            with timer.phase("train"):
                state = self.finetune(spec, (state, tx), train_inds)
            if hasattr(evaluator, "bn_state"):
                # BN-bearing dense specs: score/eval on the refreshed
                # running statistics (updated by the fcn finetune)
                evaluator.bn_state = state.bn_state

            # test evaluation: F-measure appended per round
            with timer.phase("eval"):
                preds = evaluator.evaluate(state.params, test_inds,
                                           ("prediction",))["prediction"]
                fm = f_measure(preds, test_labels)
            j.append_eval([fm])
            tb.scalars({"al/f_measure": fm,
                        "al/n_train": len(train_inds)}, round_id - 1)

            dt = time.time() - t0
            with open(j.path("query_times.txt"), "a") as f:
                f.write(f"{round_id - 1} {dt:.3f}\n")

            with timer.phase("checkpoint"):
                # anchor rounds write the full resume point; in between,
                # ckpt_full_every > 1 skips the ~0.5 GB pull entirely
                # (resume replays the journaled finetunes from the anchor)
                K = max(1, int(getattr(cfg.model, "ckpt_full_every", 1)))
                if round_id % K == 0:
                    # anchor-payload levers (engine.common): capture the
                    # ORIGINAL tensors, adopt the rounded values into the
                    # live state (bit-identity), then save the originals
                    # at the anchor dtype — the save's encode reproduces
                    # exactly what adoption installed (int8's encode is
                    # not idempotent, so encoding adopted values would
                    # drift); moments skipped under opt_reset_per_round
                    from nnal_tpu.engine.common import (
                        adopt_anchor_rounding,
                        anchor_save_kwargs,
                    )

                    akw = anchor_save_kwargs(cfg.model, state)
                    # async: the params+moments pull rides the tunnel while
                    # the next round's scoring runs; the wait above (and
                    # the guard in finetune) protects the donated buffers
                    params_d, bn_d = state.params, state.bn_state
                    adopt_anchor_rounding(state, cfg.model)
                    step_now, rid_now = int(state.step), round_id

                    def _save(params_d=params_d, bn_d=bn_d, akw=akw,
                              step_now=step_now, rid_now=rid_now):
                        save_checkpoint(j.path("curr_weights.npz"),
                                        params_d, bn_state=bn_d,
                                        al_state={"step": step_now,
                                                  "round": rid_now}, **akw)

                    if getattr(cfg.model, "async_checkpoint", False):
                        self._ckpt_writer.submit(_save)
                    else:
                        _save()
                    last_full_round = round_id
            timer.commit_round(round_id - 1, n_train=len(train_inds),
                               n_pool=len(pool_inds), f_measure=fm)
            j.save_state(round_id=round_id, rng_state=self.rng.state(),
                         n_train=len(train_inds), n_pool=len(pool_inds))

        with timer.phase("checkpoint"):
            self._ckpt_writer.wait()   # final round's save must land
            if last_full_round != round_id:
                # a completed invocation always leaves a full resume point
                # so downstream consumers read FINAL weights and a later
                # run_method call resumes replay-free; only crashes between
                # anchors ever take the replay path
                from nnal_tpu.engine.common import (
                    adopt_anchor_rounding,
                    anchor_save_kwargs,
                )

                akw = anchor_save_kwargs(cfg.model, state)
                params_d, bn_d = state.params, state.bn_state
                adopt_anchor_rounding(state, cfg.model)
                save_checkpoint(j.path("curr_weights.npz"), params_d,
                                bn_state=bn_d,
                                al_state={"step": int(state.step),
                                          "round": round_id}, **akw)
        if timer.current:
            timer.commit_round(round_id - 1, tail=True)
        tb.close()
        return {
            "n_queries": n_queries,
            "train_inds": train_inds,
            "pool_inds": pool_inds,
            "perf": j.load_evals(),
        }

    def finetune_wpool(self, spec, params_state, train_inds, pool_inds,
                       n_pseudo: int, *, epochs=None, threshold=0.9):
        """Finetune on labels + confident pseudo-labeled pool samples
        (reference ``finetune_wpool``, PW_AL.py:500-543)."""
        from nnal_tpu.scoring.pseudo import confident_samples

        # reuse the evaluator across calls: construction re-pads and
        # re-uploads the subject volumes (seconds over the tunnel) for
        # inputs that never change within an experiment
        cache = getattr(self, "_wpool_ev_cache", None)
        if cache is None or cache[0] is not spec:
            cache = self._wpool_ev_cache = (spec, self.make_evaluator(spec))
        spec_ev = cache[1]
        state, tx = params_state
        p1 = spec_ev.evaluate(state.params, pool_inds,
                              ("posteriors",))["posteriors"]
        conf_inds, pseudo, _ = confident_samples(p1, pool_inds, n_pseudo,
                                                 threshold)
        # train with the union; pseudo-labels override the mask for the
        # confident samples by temporarily patching a label lookup
        vols, mask = self._load_subject()
        patched = np.array(mask, dtype=np.float64)
        x, y, z = np.unravel_index(conf_inds, patched.shape)
        patched[x, y, z] = pseudo
        orig_mask = self._mask
        self._mask = patched
        try:
            all_inds = np.concatenate([train_inds, conf_inds])
            return self.finetune(spec, (state, tx), all_inds,
                                 epochs=epochs)
        finally:
            self._mask = orig_mask

    def modify_parameters(self, **kw) -> None:
        """In-place config edits persisted back to parameters.txt
        (reference ``modify_parameters``, PW_AL.py:71-89)."""
        from nnal_tpu.core.config import ExperimentConfig

        pars = self.config.pars
        pars.update(kw)
        self.config = ExperimentConfig.from_pars(pars)
        self.config.to_yaml(self._p("parameters.txt"))

    def reset_method(self, method_name: str) -> None:
        """Wipe a method's state back to the initial membership/weights
        (reference ``reset_method``, AL.py:502-534)."""
        import shutil

        mdir = os.path.join(self.root_dir, method_name)
        if os.path.exists(mdir):
            shutil.rmtree(mdir)
        self.add_method(method_name)

    def _ensemble_params(self):
        if not self.ensemble_paths:
            return None
        return [jax.tree_util.tree_map(jnp.asarray, load_checkpoint(p)[0])
                for p in self.ensemble_paths]

    def _build_committee(self, spec, state, tx, train_inds, round_id):
        """Committee lifecycle for ensemble/QBC-JS (reference
        PW_AL.py:780-845 + PW_NNAL.py:453-545): round 0 loads pre-trained
        weight sets; later rounds re-finetune the current model
        ``n_ensemble`` times on the labeled set, each member with its own
        batch/dropout streams (the reference got member diversity from the
        advancing global np.random state; here the streams are explicit
        and replay-stable).  With no pretrained paths configured, round 0
        falls back to independent random initializations so the method
        works with zero manual setup."""
        from nnal_tpu.models.train import TrainState

        q = self.config.query
        if len(train_inds) == 0:
            paths = list(q.pretrained_paths) or list(self.ensemble_paths)
            if paths:
                return [jax.tree_util.tree_map(jnp.asarray,
                                               load_checkpoint(p)[0])
                        for p in paths]
            return [init_cnn(spec, self.rng.fold(f"ens-init-{i}").next())[0]
                    for i in range(q.n_ensemble)]
        members = []
        for i in range(q.n_ensemble):
            # deep-copy: the scanned finetune donates its params/opt_state
            # buffers, and the main state must survive the member runs
            params_i = jax.tree_util.tree_map(jnp.copy, state.params)
            mstate = TrainState(params=params_i,
                                opt_state=tx.init(params_i),
                                step=state.step, bn_state=state.bn_state)
            mstate = self.finetune(spec, (mstate, tx), train_inds,
                                   rng_tag=f"ens-{round_id}-{i}-")
            members.append(mstate.params)
        return members

    def load_results(self, method_name: str) -> np.ndarray:
        """Per-round F-measures (reference ``load_results``,
        PW_AL.py:545-583)."""
        return MethodJournal(self.root_dir, method_name).load_evals()
