"""Multi-subject ("universal") patch-wise AL experiment.

Rebuild of ``PW_AL.Experiment_MultiImg`` (PW_AL.py:586-898): many training
subjects, per-subject grid pools with NaN-mask exclusion, queries recorded
as (voxel, subject) pairs, per-round wall-clock timing, ensemble support,
and per-iteration weight checkpoints.  The pool sweep runs per subject
through its own device-resident evaluator; global selection uses the same
concatenate + ``global2local_inds`` algebra as the reference.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.core.journal import MethodJournal, load_inds, save_inds
from nnal_tpu.core.rng import RngStream
from nnal_tpu.data.batching import make_onehot
from nnal_tpu.data.indexing import global2local_inds, local2global_inds
from nnal_tpu.data.patches import gather_labels, pad_volumes
from nnal_tpu.data.samplers import generate_grid_samples
from nnal_tpu.data.stats import multimg_stats
from nnal_tpu.evaluation.metrics import f_measure
from nnal_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model
from nnal_tpu.models.train import init_train_state
from nnal_tpu.scoring.strategies import QueryContext, query_multimg


class MultiImgExperiment:
    """AL across multiple training subjects + a held-out test set."""

    def __init__(self, root_dir: str,
                 config: Optional[ExperimentConfig] = None):
        self.root_dir = root_dir
        os.makedirs(root_dir, exist_ok=True)
        par_path = os.path.join(root_dir, "parameters.txt")
        if config is None:
            config = ExperimentConfig.from_yaml(par_path)
        else:
            config.to_yaml(par_path)
        self.config = config
        self.rng = RngStream(config.seed)
        self.train_subjects: List = []   # [(vols, mask), ...]
        self.test_subjects: List = []
        self.held_subjects: List = []    # core-set labeled bootstrap pool
        self.ensemble_paths: List[str] = []

    def attach_subjects(self, train_subjects, test_subjects=(),
                        held_subjects=()) -> None:
        """``held_subjects`` seed core-set's labeled set before any queries
        exist (reference PW_AL.py:809-822: 10 held-out subjects)."""
        self.train_subjects = list(train_subjects)
        self.test_subjects = list(test_subjects)
        self.held_subjects = list(held_subjects)

    # ------------------------------------------------------------- setup
    def prep_data(self) -> None:
        """Per-subject grid pools + cached stats (reference
        PW_AL.py:622-637,698-707)."""
        stats = multimg_stats(self.train_subjects)
        np.savetxt(self._p("train_stats.txt"), stats)
        if self.test_subjects:
            np.savetxt(self._p("test_stats.txt"),
                       multimg_stats(self.test_subjects))
        for i, (vols, mask) in enumerate(self.train_subjects):
            inds, labels = generate_grid_samples(
                vols[0].shape, self.config.data.grid_spacing, mask)
            save_inds(self._p(f"pool_inds_{i}.txt"), inds)
            save_inds(self._p(f"pool_labels_{i}.txt"), labels)

    def _p(self, name: str) -> str:
        return os.path.join(self.root_dir, name)

    def build_model(self):
        m = self.config.model
        d1, d2, d3 = m.patch_shape
        nmod = len(self.train_subjects[0][0])
        if m.model_name in ("Tiramisu", "FCDenseNet103"):
            # dense-model AL across subjects.  The FCN is fully
            # convolutional, so ONE spec (and one parameter set) serves
            # every slice shape — input_shape is channel-trace metadata
            # only (models/cnn._trace_shapes sizes conv params by
            # channels).  Heterogeneous subjects (reference
            # models_dict_for_different_sizes, eval_utils.py:413-439,
            # keyed per-size FCN graphs) ride per-shape compiled
            # programs: each subject's evaluator jits at its own shape,
            # and _finetune_fcn_multimg groups labeled slices by shape
            H, W = tuple(np.asarray(self.train_subjects[0][0][0])
                         .shape[:2])
            kw = dict(getattr(m, "model_kwargs", None) or {})
            kw.setdefault("dropout_rate", m.dropout_rate)
            if "depths" in kw:
                kw["depths"] = tuple(kw["depths"])
            return create_model(m.model_name, nclass=m.nclass,
                                input_shape=(int(H), int(W), nmod), **kw)
        return create_model(m.model_name, nclass=m.nclass,
                            dropout_rate=m.dropout_rate,
                            patch_shape=(d1, d2, nmod * d3))

    def _evaluators(self, spec, subjects, stats):
        from nnal_tpu.scoring.pool_eval import eval_compute_dtype

        patch_shape = tuple(self.config.model.patch_shape)
        cd = eval_compute_dtype(self.config.model.dtype)
        evs = []
        if getattr(spec, "fcn", False):
            from nnal_tpu.scoring.fcn_eval import FCNGridPoolEvaluator

            for i, (vols, mask) in enumerate(subjects):
                evs.append(FCNGridPoolEvaluator(
                    spec, vols, stats[i, 0::2], stats[i, 1::2],
                    tuple(np.asarray(vols[0]).shape), compute_dtype=cd))
            return evs
        for i, (vols, mask) in enumerate(subjects):
            mu = stats[i, 0::2]
            sd = stats[i, 1::2]
            padded = pad_volumes(vols, patch_shape)
            orig = tuple(np.asarray(vols[0]).shape)
            from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

            # d3 > 1 rides the same im2col sweep via z-neighbor channel
            # stacking (grid_eval.GridPoolEvaluator docstring)
            args = (spec, padded, mu, sd, patch_shape, orig)
            kw = dict(grid_spacing=self.config.data.grid_spacing,
                      ntb=self.config.query.ntb, compute_dtype=cd)
            dp = int(getattr(self.config.query, "data_parallel", 1))
            if dp > 1:
                # config-driven multi-chip pool scoring — same key as the
                # single-subject engine (config keys must not be silently
                # engine-specific)
                from nnal_tpu.parallel.grid_sharded import (
                    ShardedGridPoolEvaluator,
                )
                from nnal_tpu.parallel.mesh import cached_mesh

                evs.append(ShardedGridPoolEvaluator(cached_mesh(dp),
                                                    *args, **kw))
            else:
                evs.append(GridPoolEvaluator(*args, **kw))
        return evs

    def add_method(self, method_name: str):
        j = MethodJournal(self.root_dir, method_name)
        pools = [load_inds(self._p(f"pool_inds_{i}.txt"))
                 for i in range(len(self.train_subjects))]
        sizes = [len(p) for p in pools]
        # membership is stored in the global index space
        j.init_membership(np.zeros(0, np.int64),
                          np.arange(int(np.sum(sizes)), dtype=np.int64))
        spec = self.build_model()
        init_w = self._p("init_weights.npz")
        if not os.path.exists(init_w):
            params, bn = init_cnn(spec, self.rng.fold("init-w").next())
            save_checkpoint(init_w, params, bn_state=bn)
        params, bn, _, _ = load_checkpoint(init_w)
        save_checkpoint(j.path("curr_weights.npz"), params, bn_state=bn)
        return j

    # ------------------------------------------------------------- finetune
    def finetune_multimg(self, spec, state, tx, per_subject_inds,
                         epochs=None, rng_tag: str = ""):
        """Global batches drawn across subjects (reference
        ``finetune_multimg``, PW_AL.py:1091-1150).

        TPU-native shape (the repo's shape-stability standing rule): each
        subject's labeled patches are gathered ONCE per round on host (the
        native/NumPy gather — labeled sets are tiny, and a device gather
        jitted on the per-subject index count would compile a fresh program
        every round as the counts walk), concatenated subject-major into
        one bucket-padded device array, and all epochs' batches run inside
        the same single jitted ``lax.scan`` the single-subject engine uses
        — one device dispatch per finetune and a stable program shape.
        Committee members (``_build_committee``) reuse the cached runner."""
        from nnal_tpu.data.patches import patch_radii
        from nnal_tpu.models.train import (
            build_batch_index_matrix,
            make_scanned_finetune,
        )
        from nnal_tpu.runtime.native import gather_patches_native

        # donation guard: the scanned runner donates params/opt buffers,
        # which must not be mid-flight in an async checkpoint pull
        # (normally a no-op — run_method waits right after selection)
        w = getattr(self, "_ckpt_writer", None)
        if w is not None:
            w.wait()

        m = self.config.model
        from nnal_tpu.engine.common import maybe_reset_opt

        maybe_reset_opt(state, tx, m)
        if getattr(spec, "fcn", False):
            return self._finetune_fcn_multimg(spec, state, tx,
                                              per_subject_inds,
                                              epochs=epochs,
                                              rng_tag=rng_tag)
        epochs = m.epochs if epochs is None else epochs
        sizes = [len(v) for v in per_subject_inds]
        total = int(np.sum(sizes))
        if total == 0 or epochs == 0:
            return state

        stats = np.loadtxt(self._p("train_stats.txt")).reshape(
            len(self.train_subjects), -1)
        patch_shape = tuple(m.patch_shape)
        r1, r2, r3 = patch_radii(patch_shape)
        host_padded = getattr(self, "_host_padded", None)
        if host_padded is None:
            host_padded = self._host_padded = {}
        xs, ys = [], []
        for si, vinds in enumerate(per_subject_inds):
            vinds = np.asarray(vinds, np.int64)
            if vinds.size == 0:
                continue
            if si not in host_padded:
                host_padded[si] = [
                    np.ascontiguousarray(np.pad(
                        np.asarray(v, np.float32),
                        ((r1, r1), (r2, r2), (r3, r3))))
                    for v in self.train_subjects[si][0]]
            orig = tuple(np.asarray(self.train_subjects[si][0][0]).shape)
            xs.append(gather_patches_native(
                host_padded[si], vinds, patch_shape, orig,
                stats[si, 0::2], stats[si, 1::2]))
            ys.append(np.asarray(gather_labels(
                self.train_subjects[si][1], vinds, orig), np.int64))
        x_cat = np.concatenate(xs)
        y_cat = np.concatenate(ys)

        # bucket-pad the concatenated set so the scan compiles once per
        # bucket rather than once per AL round
        bucket = 256
        n_bucket = -(-total // bucket) * bucket
        pad = n_bucket - total
        if pad:
            x_cat = np.concatenate(
                [x_cat, np.zeros((pad,) + x_cat.shape[1:], x_cat.dtype)])
            y_cat = np.concatenate([y_cat, np.zeros(pad, np.int64)])
        x_all = jnp.asarray(x_cat)
        y_all = jnp.asarray(make_onehot(y_cat, m.nclass))

        # per-call streams keyed by the replay-stable optimizer step
        host = self.rng.fold(f"ft-multi-{rng_tag}{state.step}").host
        jrng = self.rng.fold(f"ft-multi-d-{rng_tag}{state.step}").next()
        idx_mat, w_mat = build_batch_index_matrix(total, m.b, epochs, host,
                                                  bucket=bucket)

        cache = getattr(self, "_ft_runners", None)
        if cache is None:
            cache = self._ft_runners = {}
        # honor lwf_lambda/lwf_T here too — a config key that works in
        # one engine and is silently ignored in another is the same
        # defect class as the r02 fi diag_load finding
        lwf_lambda = float(getattr(m, "lwf_lambda", 0.0))
        lwf_T = float(getattr(m, "lwf_T", 2.0))
        from nnal_tpu.scoring.pool_eval import eval_compute_dtype

        train_cd = eval_compute_dtype(getattr(m, "train_dtype", None))
        from nnal_tpu.engine.common import mt_rampdown

        cc, cc_scale = mt_rampdown(m, total)
        mt_kw = {}
        if cc > 0.0:
            mt_kw = dict(consistency_coeff=cc,
                         consistency_measure=str(
                             getattr(m, "consistency_measure", "CE")),
                         consistency_ramp=int(
                             getattr(m, "consistency_ramp", 0)),
                         ema_decay=float(getattr(m, "ema_decay", 0.99)))
        ck = (id(tx), m.b, lwf_lambda, lwf_T, train_cd,
              tuple(sorted(mt_kw.items())))
        if ck not in cache:
            cache[ck] = make_scanned_finetune(spec, tx, batch_size=m.b,
                                              mc_t=int(m.mc_t),
                                              lwf_lambda=lwf_lambda,
                                              lwf_T=lwf_T,
                                              compute_dtype=train_cd,
                                              **mt_kw)
        run = cache[ck]
        # honor config class_weights like the single-subject engine does
        # (the reference's multimg path trains unweighted, PW_AL.py:
        # 1139-1146, but a config key that works in one engine and is
        # silently ignored in the other is an internal inconsistency —
        # same class of defect as the r02 fi diag_load finding; with the
        # default "auto" the ~12%-positive labeled sets actually learn)
        cw = getattr(m, "class_weights", None)
        if isinstance(cw, str) and cw == "auto":
            counts = np.bincount(y_cat[:total].astype(np.int64),
                                 minlength=m.nclass).astype(np.float64)
            inv = counts.sum() / np.maximum(counts, 1.0)
            cw_vec = jnp.asarray(inv / inv.sum() * m.nclass, jnp.float32)
        elif cw is not None:
            cw_vec = jnp.asarray(cw, jnp.float32)
        else:
            cw_vec = jnp.ones((m.nclass,), jnp.float32)
        key = jax.random.fold_in(jrng, state.step)
        old_logits = None
        if lwf_lambda > 0.0:
            # previous model's logits over the labeled set, recorded once
            # per round (reference get_LwF, model_utils.py:98-135)
            fwd = getattr(self, "_lwf_fwd", None)
            if fwd is None:
                from nnal_tpu.models.cnn import apply_cnn

                fwd = self._lwf_fwd = jax.jit(
                    lambda p, x: apply_cnn(spec, p, x).logits)
            old_logits = fwd(state.params, x_all)
        if cc > 0.0:
            # mean-teacher: EMA teacher persists on the train state across
            # rounds (checkpointed in the anchors' teacher/ group);
            # unlabeled consistency batches come from the INITIAL
            # per-subject pools (step-keyed stream -> replay-identical)
            from nnal_tpu.models.train import build_unlabeled_index_matrix

            if state.teacher_params is None:
                state.teacher_params = jax.tree_util.tree_map(
                    jnp.copy, state.params)
            u_cat = getattr(self, "_mt_u_cat", None)
            if u_cat is None:
                from nnal_tpu.core.journal import load_inds

                per = [np.asarray(load_inds(self._p(f"pool_inds_{i}.txt")),
                                  np.int64)
                       for i in range(len(self.train_subjects))]
                u_cat = self._mt_u_cat = (
                    np.concatenate([np.full(len(p), si, np.int64)
                                    for si, p in enumerate(per)]),
                    np.concatenate(per))
            u_subj, u_vox = u_cat
            uhost = self.rng.fold(
                f"ft-multi-unlab-{rng_tag}{state.step}").host
            n_take = 256
            draw = uhost.integers(0, len(u_vox), size=n_take)
            subj, vox = u_subj[draw], u_vox[draw]
            xu_np = None
            for si in np.unique(subj):
                if si not in host_padded:
                    host_padded[si] = [
                        np.ascontiguousarray(np.pad(
                            np.asarray(v, np.float32),
                            ((r1, r1), (r2, r2), (r3, r3))))
                        for v in self.train_subjects[si][0]]
                orig = tuple(np.asarray(
                    self.train_subjects[si][0][0]).shape)
                sel_si = subj == si
                got = gather_patches_native(
                    host_padded[si], vox[sel_si], patch_shape, orig,
                    stats[si, 0::2], stats[si, 1::2])
                if xu_np is None:
                    xu_np = np.zeros((n_take,) + got.shape[1:],
                                     got.dtype)
                xu_np[sel_si] = got
            xu_all = jnp.asarray(xu_np)
            ub = int(getattr(m, "unlabeled_batch", 0)) or m.b
            u_idx = build_unlabeled_index_matrix(
                n_take, ub, idx_mat.shape[0], uhost)
            (state.params, state.opt_state, state.teacher_params, _) = run(
                state.params, state.opt_state, state.teacher_params,
                x_all, y_all, jnp.asarray(idx_mat), jnp.asarray(w_mat),
                cw_vec, key, jnp.asarray(state.step, jnp.float32),
                jnp.asarray(cc_scale, jnp.float32),
                xu_all, jnp.asarray(u_idx), old_logits)
        elif old_logits is not None:
            state.params, state.opt_state, _ = run(
                state.params, state.opt_state, x_all, y_all,
                jnp.asarray(idx_mat), jnp.asarray(w_mat), cw_vec, key,
                old_logits)
        else:
            state.params, state.opt_state, _ = run(
                state.params, state.opt_state, x_all, y_all,
                jnp.asarray(idx_mat), jnp.asarray(w_mat), cw_vec, key)
        state.step += int(idx_mat.shape[0])
        return state

    def _finetune_fcn_multimg(self, spec, state, tx, per_subject_inds,
                              epochs=None, rng_tag: str = ""):
        """Dense-model finetune across subjects: labeled axial slices from
        EVERY subject stack into one bucket-padded batch, with the CE
        masked to exactly the queried voxels (the multi-subject analog of
        PWExperiment._finetune_fcn — one jitted scan per round)."""
        from nnal_tpu.data.batching import make_onehot
        from nnal_tpu.models.train import (
            _bn_refresh_fwd,
            build_batch_index_matrix,
            make_scanned_finetune_fcn,
        )
        from nnal_tpu.scoring.pool_eval import eval_compute_dtype

        m = self.config.model
        epochs = m.epochs if epochs is None else epochs
        total = int(sum(len(v) for v in per_subject_inds))
        if total == 0 or epochs == 0:
            return state
        from nnal_tpu.engine.common import warn_fcn_unsupported_keys

        warn_fcn_unsupported_keys(self, m, train_layers_ok=False)
        stats = np.loadtxt(self._p("train_stats.txt")).reshape(
            len(self.train_subjects), -1)

        # per-subject normalized slice stacks, cached
        slices = getattr(self, "_fcn_slices", None)
        if slices is None:
            slices = self._fcn_slices = {}
        cw = getattr(m, "class_weights", None)
        lab_all = np.concatenate([
            np.asarray(self.train_subjects[si][1]).reshape(-1)[
                np.asarray(vinds, np.int64)]
            for si, vinds in enumerate(per_subject_inds)
            if len(vinds)]).astype(np.int64)
        if isinstance(cw, str) and cw == "auto":
            counts = np.bincount(lab_all, minlength=m.nclass).astype(
                np.float64)
            inv = counts.sum() / np.maximum(counts, 1.0)
            cw = (inv / inv.sum() * m.nclass).astype(np.float32)
        # group labeled slices by slice SHAPE: the fully-convolutional
        # spec shares one parameter set, but a stacked batch needs one
        # spatial shape — heterogeneous subjects (reference
        # models_dict_for_different_sizes, eval_utils.py:413-439) train
        # as per-shape scan runs, one compiled program per distinct
        # shape, sequential over groups within the round
        groups: Dict = {}
        for si, vinds in enumerate(per_subject_inds):
            vinds = np.asarray(vinds, np.int64)
            if vinds.size == 0:
                continue
            vols, mask = self.train_subjects[si]
            H, W, Z = np.asarray(vols[0]).shape
            if si not in slices:
                stack = np.stack(
                    [(np.asarray(v, np.float32) - mm) / ss
                     for v, mm, ss in zip(vols, stats[si, 0::2],
                                          stats[si, 1::2])], axis=-1)
                slices[si] = np.transpose(stack, (2, 0, 1, 3))
            x_, y_, z_ = np.unravel_index(vinds, (H, W, Z))
            lab = np.asarray(mask).reshape(-1)[vinds].astype(np.int64)
            gsubs = getattr(self, "_fcn_group_subs", None)
            if gsubs is None:
                gsubs = self._fcn_group_subs = {}
            gsubs.setdefault((H, W), set()).add(si)
            xs, ys, ws = groups.setdefault((H, W), ([], [], []))
            for zv in np.unique(z_):
                sel = z_ == zv
                xs.append(slices[si][int(zv)])
                yv = np.zeros((H, W), np.int64)
                wv = np.zeros((H, W), np.float32)
                yv[x_[sel], y_[sel]] = lab[sel]
                wv[x_[sel], y_[sel]] = (1.0 if cw is None
                                        else np.asarray(cw)[lab[sel]])
                ys.append(yv)
                ws.append(wv)

        fcn_b = max(1, min(int(m.b), 4))
        train_cd = eval_compute_dtype(getattr(m, "train_dtype", None))
        from nnal_tpu.engine.common import mt_rampdown

        cc, cc_scale = mt_rampdown(m, total)
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
        ck = (id(tx), "fcn", fcn_b, train_cd,
              tuple(sorted(mt_kw.items())))
        if ck not in cache:
            cache[ck] = make_scanned_finetune_fcn(spec, tx,
                                                  batch_size=fcn_b,
                                                  compute_dtype=train_cd,
                                                  **mt_kw)
        run = cache[ck]
        step0 = state.step
        for gi, shape in enumerate(sorted(groups)):
            xs, ys, ws = groups[shape]
            H, W = shape
            S = len(xs)
            s_bucket = -(-S // 8) * 8
            for _ in range(s_bucket - S):
                xs.append(np.zeros_like(xs[0]))
                ys.append(np.zeros((H, W), np.int64))
                ws.append(np.zeros((H, W), np.float32))
            x_all = jnp.asarray(np.stack(xs))
            y_all = jnp.asarray(make_onehot(
                np.stack(ys).reshape(-1), m.nclass).reshape(
                    s_bucket, H, W, m.nclass))
            wpix_all = jnp.asarray(np.stack(ws))

            # replay-stable streams keyed on the round-ENTRY step; the
            # group tag only appears with >1 shapes, so single-shape
            # campaigns keep their exact pre-existing trajectories
            gtag = f"g{gi}-" if len(groups) > 1 else ""
            host = self.rng.fold(
                f"ft-multi-{rng_tag}{gtag}{step0}").host
            jrng = self.rng.fold(
                f"ft-multi-d-{rng_tag}{gtag}{step0}").next()
            idx_mat, w_mat = build_batch_index_matrix(S, fcn_b, epochs,
                                                      host, bucket=8)
            key = jax.random.fold_in(jrng, step0)
            if cc > 0.0:
                # dense mean-teacher per shape group: unlabeled whole
                # slices from this group's subjects (dense consistency
                # needs no labels); step-keyed stream -> replay-identical
                from nnal_tpu.models.train import (
                    build_unlabeled_index_matrix,
                )

                if state.teacher_params is None:
                    state.teacher_params = jax.tree_util.tree_map(
                        jnp.copy, state.params)
                uhost = self.rng.fold(
                    f"ft-multi-unlab-{rng_tag}{gtag}{step0}").host
                g_subs = sorted(self._fcn_group_subs[shape])
                n_u = 16
                su = uhost.integers(0, len(g_subs), size=n_u)
                xu = []
                for gi_s in su:
                    si_u = g_subs[int(gi_s)]
                    zmax = slices[si_u].shape[0]
                    xu.append(slices[si_u][int(uhost.integers(0, zmax))])
                xu_all = jnp.asarray(np.stack(xu))
                ub = max(1, min(int(getattr(m, "unlabeled_batch", 0))
                                or fcn_b, 4))
                u_idx = build_unlabeled_index_matrix(
                    n_u, ub, idx_mat.shape[0], uhost)
                (state.params, state.opt_state, state.teacher_params,
                 _) = run(
                    state.params, state.opt_state, state.teacher_params,
                    x_all, y_all, wpix_all, jnp.asarray(idx_mat),
                    jnp.asarray(w_mat), key,
                    jnp.asarray(step0, jnp.float32),
                    jnp.asarray(cc_scale, jnp.float32), xu_all,
                    jnp.asarray(u_idx))
            else:
                state.params, state.opt_state, _ = run(
                    state.params, state.opt_state, x_all, y_all,
                    wpix_all, jnp.asarray(idx_mat), jnp.asarray(w_mat),
                    key)
            state.step += int(idx_mat.shape[0])
            if state.bn_state:
                # re-center BN running stats on the current model/data
                # (see PWExperiment._finetune_fcn — decay 0.6 over 8
                # batches per shape group)
                bnfwd = _bn_refresh_fwd(spec, 0.6)
                bn = state.bn_state
                for _ in range(8):
                    bi = host.integers(0, S, size=fcn_b)
                    bn = bnfwd(state.params, bn, x_all[jnp.asarray(bi)])
                state.bn_state = bn
        return state

    def _cached_tx(self):
        from nnal_tpu.engine.common import cached_tx

        return cached_tx(self, self.config.model)

    # ------------------------------------------------------------- committee
    def _build_committee(self, spec, state, tx, train_vox, round_id):
        """Ensemble/QBC-JS lifecycle (reference PW_AL.py:780-845 model
        holder + PW_NNAL.py:453-545): pre-trained weight sets before any
        labels exist, per-round re-finetuned copies of the current model
        afterwards.  Falls back to independent random inits at round 0 when
        no pretrained paths are configured."""
        from nnal_tpu.models.train import TrainState

        q = self.config.query
        n_labels = int(np.sum([len(v) for v in train_vox]))
        if n_labels == 0:
            paths = list(q.pretrained_paths) or list(self.ensemble_paths)
            if paths:
                return [jax.tree_util.tree_map(jnp.asarray,
                                               load_checkpoint(p)[0])
                        for p in paths]
            return [init_cnn(spec, self.rng.fold(f"ens-init-{i}").next())[0]
                    for i in range(q.n_ensemble)]
        members = []
        for i in range(q.n_ensemble):
            params_i = jax.tree_util.tree_map(jnp.copy, state.params)
            mstate = TrainState(params=params_i,
                                opt_state=tx.init(params_i),
                                step=state.step, bn_state=state.bn_state)
            mstate = self.finetune_multimg(spec, mstate, tx, train_vox,
                                           rng_tag=f"ens-{round_id}-{i}-")
            members.append(mstate.params)
        return members

    def _bootstrap_features(self, spec, params) -> Optional[np.ndarray]:
        """Labeled-set seed features for core-set before any queries exist:
        grid samples over held-out subjects (reference PW_AL.py:809-822,
        ``gen_multimg_inds(labeled_paths, 50)``)."""
        if not self.held_subjects:
            return None
        stats = multimg_stats(self.held_subjects)
        evs = self._evaluators(spec, self.held_subjects, stats)
        feats = []
        for i, ev in enumerate(evs):
            vols, mask = self.held_subjects[i]
            inds, _ = generate_grid_samples(
                np.asarray(vols[0]).shape,
                self.config.query.bootstrap_spacing, mask)
            if len(inds) == 0:
                continue
            feats.append(ev.evaluate(params, inds,
                                     ("feature_layer",))["feature_layer"])
        return np.concatenate(feats) if feats else None

    # ------------------------------------------------------------- test eval
    def test_eval(self, spec, params) -> float:
        """Aggregate F-measure over held-out subjects' grid voxels
        (reference ``test_eval``, PW_AL.py:639-677)."""
        if not self.test_subjects:
            return float("nan")
        # cache the evaluators across rounds: building one re-uploads the
        # padded test volumes to the device, seconds per round over the
        # tunnel for work whose inputs never change
        evs = getattr(self, "_test_evs", None)
        if evs is None:
            stats = np.loadtxt(self._p("test_stats.txt")).reshape(
                len(self.test_subjects), -1)
            evs = self._test_evs = self._evaluators(
                spec, self.test_subjects, stats)
            self._test_grids = [
                generate_grid_samples(
                    np.asarray(vols[0]).shape,
                    self.config.data.grid_spacing, mask)
                for vols, mask in self.test_subjects]
        # BN-bearing dense specs: evaluators are constructed with
        # bn_state=None, so apply the engine's current running stats on
        # EVERY call (covers the lazy first construction — without this
        # the round-1 test eval ran on batch statistics)
        bn_sync = getattr(self, "_bn_sync", None)
        if bn_sync is not None:
            for ev in evs:
                if hasattr(ev, "bn_state"):
                    ev.bn_state = bn_sync
        preds, masks = {}, {}
        for i, ev in enumerate(evs):
            inds, labels = self._test_grids[i]
            p = ev.evaluate(params, inds, ("prediction",))["prediction"]
            preds[i] = p
            masks[i] = labels
        return f_measure(preds, masks)

    # ------------------------------------------------------------- AL loop
    def run_method(self, method_name: str, max_queries: int) -> Dict:
        cfg = self.config
        j = MethodJournal(self.root_dir, method_name)
        spec = self.build_model()
        stats = np.loadtxt(self._p("train_stats.txt")).reshape(
            len(self.train_subjects), -1)
        evs = self._evaluators(spec, self.train_subjects, stats)
        pools = [load_inds(self._p(f"pool_inds_{i}.txt"))
                 for i in range(len(self.train_subjects))]

        from nnal_tpu.models.checkpoint import restore_opt_state

        ckpt = j.path("curr_weights.npz")
        params, bn, teacher, al_state = load_checkpoint(ckpt)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state, tx = init_train_state(spec, params, cfg.model.optimizer_name,
                                     cfg.model.learning_rate, bn_state=bn,
                                     tx=self._cached_tx())
        self._tx = tx
        if teacher is not None:
            # MT-SSL: the EMA teacher is part of the resume point
            state.teacher_params = jax.tree_util.tree_map(jnp.asarray,
                                                          teacher)
        state.opt_state = restore_opt_state(ckpt, state.opt_state)
        if al_state is not None:
            state.step = int(al_state.get("step", 0))
        saved = j.load_state()
        if saved is not None:
            self.rng.restore(saved["rng"])
        n_queries = j.n_queried(matrix=True)
        round_id = len(j.query_iters())
        train_g, pool_g = j.membership()   # global index space
        sizes = [len(p) for p in pools]
        from nnal_tpu.engine.common import reconcile_membership

        _offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])

        def _qmat_to_global(qmat):
            # journal rows are (voxel, subject); membership is global ids
            # over the concatenated ORIGINAL per-subject pools.  Exact
            # position lookup — the pool files are NOT sorted (the grid
            # sampler emits slice-major order with per-slice resets), so a
            # searchsorted here returned wrong positions and the earlier
            # assert tripped on any crash-repair after round 0
            pos_of = [
                {int(v): i for i, v in enumerate(np.asarray(p).tolist())}
                for p in pools]
            out = []
            for v, s in qmat.T:
                out.append(int(_offsets[s]) + pos_of[int(s)][int(v)])
            return np.asarray(out, np.int64)

        train_g, pool_g, _ = reconcile_membership(
            j, train_g, pool_g, matrix=True, to_global=_qmat_to_global)

        # ckpt_full_every > 1: the resume point on disk may be an anchor
        # from an earlier round — replay the journaled rounds' finetunes
        # (bit-identical; see engine.common.replay_prefix_lens —
        # matrix=True because multi journals are (voxel, subject) 2 x k).
        # bf16 anchors: re-apply the adoption roundings at the same rounds
        # the live process did (they are part of the trajectory)
        from nnal_tpu.engine.common import (
            adopt_anchor_rounding,
            replay_prefix_lens,
        )

        K_replay = max(1, int(getattr(cfg.model, "ckpt_full_every", 1)))
        anchor0 = (0 if al_state is None
                   else int(al_state.get("round", round_id)))
        for ri, ln in enumerate(replay_prefix_lens(
                j, al_state, round_id, len(train_g), matrix=True)):
            tv = [pools[i][loc] for i, loc in
                  enumerate(global2local_inds(train_g[:ln], sizes))]
            state = self.finetune_multimg(spec, state, tx, tv)
            if (anchor0 + ri + 1) % K_replay == 0:
                adopt_anchor_rounding(state, cfg.model)
        # BN-bearing dense specs: pool evaluators were constructed with
        # bn_state=None — sync them to the resumed (and replay-refreshed)
        # running stats BEFORE the first selection, and mirror the pointer
        # so test_eval's lazily-built evaluators pick it up too
        self._bn_sync = state.bn_state
        for ev in evs:
            if hasattr(ev, "bn_state"):
                ev.bn_state = state.bn_state

        times_path = os.path.join(self.root_dir, "AL_running_times")
        os.makedirs(times_path, exist_ok=True)

        from nnal_tpu.core.profiling import PhaseTimer
        from nnal_tpu.models.checkpoint import AsyncCheckpointWriter

        # same per-phase JSONL stream as the single-subject engine
        # (SURVEY §5.1); the dt_<i> files below keep reference parity
        timer = PhaseTimer(j.path("phases.jsonl"))
        if getattr(self, "_ckpt_writer", None) is None:
            self._ckpt_writer = AsyncCheckpointWriter()

        # entry state is reproducible as-is (anchor ckpt or replay above)
        last_full_round = round_id

        while n_queries < max_queries and len(pool_g) > 0:
            k = min(cfg.query.k, max_queries - n_queries, len(pool_g))
            # per-round stateless stream (replayable on crash-resume)
            qrng = self.rng.fold(f"q-{method_name}-{round_id}")
            # current per-subject pool views
            local_pool = global2local_inds(pool_g, sizes)
            per_subject_train = global2local_inds(train_g, sizes)
            train_vox = [pools[i][per_subject_train[i]]
                         for i in range(len(pools))]

            # method-specific labeled-set prep (reference PW_AL.py:805-845)
            ensemble_params = None
            if method_name in ("ensemble", "QBC-JS"):
                with timer.phase("committee"):
                    ensemble_params = self._build_committee(
                        spec, state, tx, train_vox, round_id)
            extra = {"influence_mode": cfg.query.influence_mode,
                     "arnoldi_rank": cfg.query.arnoldi_rank}
            if method_name == "core-set" and len(train_g) == 0:
                bf = self._bootstrap_features(spec, state.params)
                if bf is not None:
                    extra["bootstrap_features"] = bf

            contexts = []
            for si in range(len(self.train_subjects)):
                # per-subject extra: shared keys (bootstrap features) plus
                # this subject's label mask (influence) and its own
                # superpixel cache slot (SuPix)
                extra_i = dict(extra)
                extra_i["mask"] = self.train_subjects[si][1]
                overseg_cache = getattr(self, "_overseg_cache", None)
                if overseg_cache is None:
                    overseg_cache = self._overseg_cache = {}
                if si in overseg_cache:
                    extra_i["overseg"] = overseg_cache[si]
                contexts.append(QueryContext(
                    spec=spec, params=state.params, evaluator=evs[si],
                    pool_inds=pools[si][local_pool[si]], k=k,
                    rng=qrng.host, jax_rng=qrng.next(), B=cfg.query.B,
                    MC_iters=cfg.query.MC_iters, lambda_=cfg.query.lambda_,
                    diag_load=float(getattr(cfg.query, "diag_load", 1e-5)),
                    ensemble_params=ensemble_params,
                    train_inds=train_vox[si],
                    raw_volume=np.asarray(self.train_subjects[si][0][0]),
                    extra=extra_i))

            t0 = time.time()
            with timer.phase("score_select"):
                per_subject_q = query_multimg(contexts, method_name, k,
                                              qrng.host)
            dt = time.time() - t0
            with timer.phase("checkpoint"):
                # previous round's async save overlapped the scoring above;
                # it must be durable before this round writes any state
                # (same crash-consistency window as a synchronous save)
                self._ckpt_writer.wait()
            for si, c in enumerate(contexts):
                if c.extra.get("overseg") is not None:
                    self._overseg_cache[si] = c.extra["overseg"]
            with open(os.path.join(times_path, f"dt_{round_id}"),
                      "w") as f:
                f.write(f"{dt:.4f}\n")

            # map per-subject positions back to the global pool space
            cursizes = [len(lp) for lp in local_pool]
            q_global_pos = local2global_inds(per_subject_q, cursizes)
            q_g = pool_g[q_global_pos]

            # (voxel, subject) matrix journal (reference Q_mat,
            # PW_AL.py:857-885)
            subj_of = np.searchsorted(
                np.cumsum(sizes), q_g, side="right")
            # global id -> (subject, local position) is just an offset
            # subtraction; subj_of already holds the subject mapping
            voxels = np.asarray([pools[s][g - _offsets[s]]
                                 for g, s in zip(q_g, subj_of)])
            qmat = np.stack([voxels, subj_of])
            np.savetxt(os.path.join(j.queries_dir, f"{round_id}.txt"),
                       qmat, fmt="%d")

            train_g = np.concatenate([train_g, q_g])
            pool_g = np.setdiff1d(pool_g, q_g)
            j.init_membership(train_g, pool_g)
            n_queries += len(q_g)
            round_id += 1

            per_subject_train = global2local_inds(train_g, sizes)
            train_vox = [pools[i][per_subject_train[i]]
                         for i in range(len(pools))]
            with timer.phase("train"):
                state = self.finetune_multimg(spec, state, tx, train_vox)
            self._bn_sync = state.bn_state
            for ev in evs + list(getattr(self, "_test_evs", []) or []):
                if hasattr(ev, "bn_state"):
                    # BN-bearing dense specs score on refreshed stats
                    ev.bn_state = state.bn_state

            with timer.phase("eval"):
                fm = self.test_eval(spec, state.params)
            j.append_eval([fm])
            with timer.phase("checkpoint"):
                # async: the ~0.5 GB params+moments pull rides the tunnel
                # while the next round's scoring runs on device; finetune
                # waits before donating these buffers (finetune_multimg).
                # Non-anchor rounds (ckpt_full_every > 1) pull params+bn
                # only — the per-iter history copy keeps reference parity
                # while the 2/3 of the payload that is Adam moments stays
                # on device (resume replays from the last anchor).
                K = max(1, int(getattr(cfg.model, "ckpt_full_every", 1)))
                full = round_id % K == 0
                # hist_every=H writes the analysis-only per-iter history
                # copy every H rounds (0 = never): with ckpt_full_every>1
                # it is the only pull left on non-anchor rounds, so
                # skipping it makes those rounds checkpoint-byte-free
                H = int(getattr(cfg.model, "hist_every", 1))
                want_hist = H > 0 and round_id % H == 0
                # anchor-payload levers (engine.common): bf16/int8
                # adoption keeps crash-resume bit-identical under the
                # shrunken anchor; opt_reset_per_round drops the moment
                # leaves (2/3 of the payload) from the anchor entirely.
                # Capture the ORIGINAL tensors BEFORE adopting: the save
                # encodes these with the same deterministic program whose
                # decode the adoption installed (for int8 the encode is
                # not idempotent, so encoding the adopted values instead
                # would drift by 1 ulp in the scales)
                from nnal_tpu.engine.common import (
                    adopt_anchor_rounding,
                    anchor_dtype,
                )

                include_opt = not getattr(cfg.model, "opt_reset_per_round",
                                          False)
                params_d, bn_d, opt_d, teach_d = (
                    state.params, state.bn_state,
                    state.opt_state if include_opt else None,
                    state.teacher_params)
                a_dt = anchor_dtype(cfg.model)
                if full:
                    adopt_anchor_rounding(state, cfg.model)
                enc_anchor = full and a_dt != "float32"
                step_now, rid = int(state.step), round_id
                # history copies are analysis-only: hist_dtype=float16
                # halves their device->host bytes (cast on device, one
                # tiny cached program per leaf shape). Resume points stay
                # full precision, so replay stays bit-identical.
                hd = str(getattr(cfg.model, "hist_dtype", "float32"))
                cast_hist = hd != "float32" and want_hist
                hist_p, hist_b = params_d, bn_d
                if cast_hist:
                    # ONE jitted whole-tree cast: eager per-leaf astype
                    # dispatched ~10 tiny programs, each a separate remote
                    # compile on tunneled backends (measured: it ate the
                    # byte savings in short campaigns). Cache keyed on the
                    # dtype so a config change mid-instance rebuilds it.
                    cached = getattr(self, "_hist_cast", (None, None))
                    if cached[0] != hd:
                        cast = jnp.dtype(hd)
                        to_h = (lambda v: v.astype(cast)
                                if jnp.issubdtype(v.dtype, jnp.floating)
                                else v)
                        cached = (hd, jax.jit(
                            lambda t: jax.tree_util.tree_map(to_h, t)))
                        self._hist_cast = cached
                    caster = cached[1]
                    hist_p = caster(params_d)
                    hist_b = caster(bn_d) if bn_d is not None else None

                def _save(hist_p=hist_p, hist_b=hist_b, params_d=params_d,
                          bn_d=bn_d, opt_d=opt_d, teach_d=teach_d,
                          step_now=step_now,
                          rid=rid, full=full, want_hist=want_hist,
                          cast_hist=cast_hist, enc_anchor=enc_anchor,
                          a_dt=a_dt):
                    from nnal_tpu.models.checkpoint import \
                        _chunked_device_get

                    if full and enc_anchor:
                        # encoded anchors (bf16/int8): save_checkpoint
                        # encodes device-side itself, so the pull is the
                        # shrunken payload; the history copy (if any)
                        # keeps its own path below
                        save_checkpoint(j.path("curr_weights.npz"),
                                        params_d, bn_state=bn_d,
                                        opt_state=opt_d,
                                        teacher_params=teach_d,
                                        al_state={"step": step_now,
                                                  "round": rid},
                                        dtype=a_dt)
                    # share one pull between the history copy and the
                    # (full-precision) resume point when byte-identical
                    payload = {}
                    if want_hist:
                        payload["p"], payload["b"] = hist_p, hist_b
                    if full and not enc_anchor:
                        if cast_hist or not want_hist:
                            payload["rp"], payload["rb"] = params_d, bn_d
                        if opt_d is not None:
                            payload["o"] = opt_d
                        if teach_d is not None:
                            payload["t"] = teach_d
                    if not payload:        # hist_every skipped, non-anchor:
                        return             # zero checkpoint bytes this round
                    pulled = _chunked_device_get(payload)
                    if want_hist:
                        save_checkpoint(j.path(f"curr_weights_{rid}.npz"),
                                        pulled["p"], bn_state=pulled["b"])
                    if full and not enc_anchor:
                        save_checkpoint(j.path("curr_weights.npz"),
                                        pulled.get("rp", pulled.get("p")),
                                        bn_state=pulled.get(
                                            "rb", pulled.get("b")),
                                        opt_state=pulled.get("o"),
                                        teacher_params=pulled.get("t"),
                                        al_state={"step": step_now,
                                                  "round": rid})

                if getattr(cfg.model, "async_checkpoint", False):
                    self._ckpt_writer.submit(_save)
                else:
                    _save()
                if full:
                    last_full_round = round_id
                j.save_state(round_id=round_id, rng_state=self.rng.state(),
                             n_train=len(train_g), n_pool=len(pool_g))
            timer.commit_round(round_id - 1, n_train=len(train_g),
                               n_pool=len(pool_g), f_measure=fm)

        with timer.phase("checkpoint"):
            self._ckpt_writer.wait()   # final round's save must land
            if last_full_round != round_id:
                # a completed invocation always leaves a full resume point;
                # only crashes between anchors ever take the replay path
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
            # tail record so the final async wait stays visible in the
            # phase journal (summed with its round by consumers)
            timer.commit_round(round_id - 1, tail=True)
        return {"n_queries": n_queries, "perf": j.load_evals(),
                "train_global": train_g, "pool_global": pool_g}
