"""Classification AL experiment (runs x methods).

Rebuild of ``AL.Experiment`` (AL.py:16-753): an experiment root holds
``parameters.txt`` plus numbered *runs*; each run fixes a random
train/test/pool partition and an initial model; each *method* inside a run
owns its membership/queries/metrics, resumable via the queries journal.
Per round: query -> move to train -> retrain -> predict test -> append
accuracy (reference run_method, AL.py:299-500).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.core.journal import MethodJournal, load_inds, save_inds
from nnal_tpu.core.rng import RngStream
from nnal_tpu.data.batching import gen_batch_inds, make_onehot
from nnal_tpu.evaluation.metrics import accuracy
from nnal_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model
from nnal_tpu.models.train import init_train_state, make_train_step
from nnal_tpu.scoring.cls_strategies import ClsQueryContext, batched_forward, cls_query


class Experiment:
    """Classification AL over an in-memory ``(X, labels)`` dataset."""

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
        self._pool = None
        if int(getattr(config.query, "data_parallel", 1)) > 1:
            # the mesh key shards the patch-wise engines' grid sweeps;
            # this engine's disk-backed image pools are separate machinery
            # — warn instead of silently ignoring the key
            import warnings

            warnings.warn("data_parallel > 1 applies to the patch-wise "
                          "engines' grid-pool scoring; the classification "
                          "engine runs single-device", stacklevel=2)

    def attach_data(self, X, labels) -> None:
        from nnal_tpu.data.image_pool import InMemoryPool

        self._pool = InMemoryPool(X, labels)

    def attach_pool(self, pool) -> None:
        """Attach a disk-backed pool (``data.image_pool.ImagePathPool`` —
        reference ``load_winds`` path-list batching, NN.py:1479) or any
        object with ``__len__``/``labels``/``input_shape``/``fetch``."""
        self._pool = pool

    # ------------------------------------------------------------- runs
    def _run_dir(self, run: int) -> str:
        return os.path.join(self.root_dir, str(run))

    def add_run(self) -> int:
        """New run: random test/pool/init-train partition + fresh init
        weights (reference ``add_run``, AL.py:148-241)."""
        existing = [int(d) for d in os.listdir(self.root_dir)
                    if d.isdigit()]
        run = max(existing) + 1 if existing else 0
        rdir = self._run_dir(run)
        os.makedirs(rdir, exist_ok=True)

        n = len(self._pool)
        host = self.rng.fold(f"run{run}").host
        perm = host.permutation(n)
        n_test = int(self.config.query.test_ratio * n)
        test = perm[:n_test]
        rest = perm[n_test:]
        init_size = self.config.query.init_size
        train = rest[:init_size]
        pool = rest[init_size:]
        save_inds(os.path.join(rdir, "test_inds.txt"), test)
        save_inds(os.path.join(rdir, "init_train_inds.txt"), train)
        save_inds(os.path.join(rdir, "init_pool_inds.txt"), pool)

        spec = self.build_model()
        params, bn = init_cnn(spec, self.rng.fold(f"init{run}").next())
        save_checkpoint(os.path.join(rdir, "init_weights.npz"), params,
                        bn_state=bn)
        return run

    def build_model(self):
        m = self.config.model
        input_shape = tuple(self._pool.input_shape)
        return create_model(m.model_name, nclass=m.nclass,
                            dropout_rate=m.dropout_rate,
                            patch_shape=input_shape,
                            input_shape=input_shape)

    # ------------------------------------------------------------- methods
    def add_method(self, method_name: str, run: int):
        rdir = self._run_dir(run)
        j = MethodJournal(rdir, method_name)
        train = load_inds(os.path.join(rdir, "init_train_inds.txt"))
        pool = load_inds(os.path.join(rdir, "init_pool_inds.txt"))
        j.init_membership(train, pool)
        params, bn, _, _ = load_checkpoint(
            os.path.join(rdir, "init_weights.npz"))
        save_checkpoint(j.path("curr_weights.npz"), params, bn_state=bn)
        return j

    def _cached_tx(self):
        from nnal_tpu.engine.common import cached_tx

        return cached_tx(self, self.config.model)

    # ------------------------------------------------------------- training
    def _retrain(self, spec, state, tx, train_inds, epochs: int,
                 rng_tag: str = ""):
        m = self.config.model
        from nnal_tpu.engine.common import maybe_reset_opt

        maybe_reset_opt(state, tx, m)
        # cache the jitted step across AL rounds: a fresh closure per round
        # recompiles every round (per-round latency on a tunneled TPU)
        cache = getattr(self, "_step_fns", None)
        if cache is None:
            cache = self._step_fns = {}
        # honor lwf_lambda/lwf_T in this engine too (config keys must not
        # be silently engine-specific)
        lwf_lambda = float(getattr(m, "lwf_lambda", 0.0))
        lwf_T = float(getattr(m, "lwf_T", 2.0))
        from nnal_tpu.scoring.pool_eval import eval_compute_dtype

        train_cd = eval_compute_dtype(getattr(m, "train_dtype", None))
        # honor train_layers and class_weights in this engine too (config
        # keys must not be silently engine-specific — the PW engines
        # support both; reference var_list filtering NN.py:557 and
        # class-cost weighting)
        grad_mask = None
        if m.train_layers:
            from nnal_tpu.models.optim import layer_train_mask

            grad_mask = layer_train_mask(state.params, m.train_layers)
        cw = getattr(m, "class_weights", None)
        if isinstance(cw, str) and cw == "auto":
            # inverse-frequency over the current labeled set
            y_all = np.asarray(self._pool.labels)[train_inds]
            counts = np.bincount(np.asarray(y_all, np.int64),
                                 minlength=m.nclass).astype(np.float64)
            inv = counts.sum() / np.maximum(counts, 1.0)
            cw = (inv / inv.sum() * m.nclass).astype(np.float32)
        # cw is passed at RUNTIME (cw= arg of step_fn): "auto" weights
        # change every round and would bake a new program each time
        cw_vec = None if cw is None else jnp.asarray(cw, jnp.float32)
        # mean-teacher consistency (config-driven like the PW engines):
        # this engine applies it on each training batch — the student sees
        # the batch with dropout, the EMA teacher clean (reference MT_SSL
        # batch semantics, NN_extended.py:1337-1396)
        from nnal_tpu.engine.common import mt_rampdown

        cc, cc_scale = mt_rampdown(m, len(train_inds))
        coeff_fn = None
        if cc > 0.0:
            ramp_len = int(getattr(m, "consistency_ramp", 0))
            if ramp_len > 0:
                from nnal_tpu.models.optim import sigmoid_rampup

                _ramp = sigmoid_rampup(ramp_len)
            else:
                def _ramp(t):
                    return 1.0

            def coeff_fn(step, _cc=cc):
                return _cc * _ramp(step)

            if state.teacher_params is None:
                state.teacher_params = jax.tree_util.tree_map(
                    jnp.copy, state.params)
        ck = (id(tx), lwf_lambda, lwf_T, train_cd,
              tuple(m.train_layers or ()), cc,
              int(getattr(m, "consistency_ramp", 0)),
              str(getattr(m, "consistency_measure", "CE")))
        if ck not in cache:
            cache[ck] = make_train_step(
                spec, tx, mc_t=int(m.mc_t),
                lwf_lambda=lwf_lambda, lwf_T=lwf_T,
                compute_dtype=train_cd, grad_mask=grad_mask,
                consistency_coeff=coeff_fn,
                consistency_measure=str(
                    getattr(m, "consistency_measure", "CE")))
        step_fn = cache[ck]
        if lwf_lambda > 0.0:
            # previous model's logits act as distillation targets; record
            # the round-entry params once (reference get_LwF,
            # model_utils.py:98-135) and evaluate them per fetched batch
            fwd = getattr(self, "_lwf_fwd", None)
            if fwd is None:
                from nnal_tpu.models.cnn import apply_cnn

                fwd = self._lwf_fwd = jax.jit(
                    lambda p, x: apply_cnn(spec, p, x).logits)
            old_params = jax.tree_util.tree_map(jnp.copy, state.params)
        # per-call streams keyed by the replay-stable optimizer step;
        # rng_tag separates committee members' batch/dropout streams
        # (members share the main state's step, so an untagged fold would
        # make every member's retrain identical)
        host = self.rng.fold(f"{rng_tag}retrain-{state.step}").host
        jrng = self.rng.fold(f"{rng_tag}retrain-dropout-{state.step}").next()
        for _ in range(epochs):
            for batch in gen_batch_inds(len(train_inds), m.b, host):
                binds = train_inds[batch]
                # per-batch fetch: in-memory arrays or disk-backed
                # load_winds-style pools alike (reference NN.py:699,716)
                xb, yb = self._pool.fetch(binds)
                # shape-stability rule: gen_batch_inds' remainder batch
                # changes size as len(train) % b walks with each round's
                # +k, compiling a new step program on those rounds — pad
                # every batch to b with zero-weight rows instead (the
                # weighted mean over valid rows equals the plain mean over
                # the unpadded batch exactly)
                pad = m.b - len(batch)
                if pad > 0:
                    xb = np.concatenate(
                        [xb, np.zeros((pad,) + np.shape(xb)[1:],
                                      np.asarray(xb).dtype)])
                    yb = np.concatenate([yb, np.zeros(pad, np.int64)])
                w = jnp.asarray(np.arange(m.b) < m.b - pad, jnp.float32)
                x = jnp.asarray(xb)
                y = jnp.asarray(make_onehot(yb, m.nclass))
                key = jax.random.fold_in(jrng, state.step)
                ol = fwd(old_params, x) if lwf_lambda > 0.0 else None
                state.params, state.opt_state, _ = step_fn(
                    state.params, state.opt_state, x, y, key,
                    jnp.asarray(state.step), state.teacher_params, w, ol,
                    cw_vec, cc_scale=jnp.asarray(cc_scale, jnp.float32))
                if cc > 0.0:
                    from nnal_tpu.models.optim import ema_update

                    state.teacher_params = ema_update(
                        state.teacher_params, state.params,
                        float(getattr(m, "ema_decay", 0.99)))
                state.step += 1
        if state.bn_state:
            # refresh BN running statistics over the labeled set (the
            # reference's update_BN_stats pass, NN_extended.py:1059-1084;
            # the train step itself normalizes on batch stats and never
            # touches the moving averages) so eval/scoring run in eval
            # mode on current statistics
            from nnal_tpu.models.train import update_bn_stats

            def _bn_batch():
                b = host.choice(len(train_inds),
                                size=min(m.b, len(train_inds)),
                                replace=False)
                return self._pool.fetch(train_inds[b])[0]

            state.bn_state = update_bn_stats(
                spec, state.params, state.bn_state, _bn_batch,
                iters=min(20, max(1, len(train_inds) // m.b)))
        return state

    def _build_committee(self, spec, state, tx, train_inds, round_id):
        """Committee lifecycle for ensemble/QBC-JS — mirrors the patch-wise
        engines' ``_build_committee`` (reference PW_AL.py:780-845, patch-wise
        only; the classification engine is a rebuild extra): round 0 with
        configured ``query.pretrained_paths`` loads those weight sets;
        otherwise ``n_ensemble`` copies of the current model are re-trained
        on the labeled set, each member with its own batch/dropout streams
        (replay-stable via rng tags)."""
        from nnal_tpu.models.train import TrainState

        q = self.config.query
        paths = list(getattr(q, "pretrained_paths", []) or [])
        if round_id == 0 and paths:
            return [jax.tree_util.tree_map(jnp.asarray,
                                           load_checkpoint(p)[0])
                    for p in paths]
        members = []
        for i in range(q.n_ensemble):
            params_i = jax.tree_util.tree_map(jnp.copy, state.params)
            mstate = TrainState(params=params_i,
                                opt_state=tx.init(params_i),
                                step=state.step, bn_state=state.bn_state)
            mstate = self._retrain(spec, mstate, tx, train_inds,
                                   self.config.model.epochs,
                                   rng_tag=f"ens-{round_id}-{i}-")
            members.append(mstate.params)
        return members

    # ------------------------------------------------------------- AL loop
    def run_method(self, method_name: str, run: int,
                   max_queries: int) -> Dict:
        cfg = self.config
        rdir = self._run_dir(run)
        j = MethodJournal(rdir, method_name)
        spec = self.build_model()
        test_inds = load_inds(os.path.join(rdir, "test_inds.txt"))

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
        n_queries = j.n_queried()
        round_id = len(j.query_iters())
        train_inds, pool_inds = j.membership()
        from nnal_tpu.engine.common import reconcile_membership

        train_inds, pool_inds, _ = reconcile_membership(j, train_inds,
                                                        pool_inds)

        # ckpt_full_every > 1: the resume point may be an anchor from an
        # earlier round — replay the journaled rounds' retrains
        # (bit-identical; see engine.common.replay_prefix_lens).
        # bf16 anchors: re-apply the adoption roundings at the same rounds
        # the live process did (they are part of the trajectory)
        from nnal_tpu.engine.common import (
            adopt_anchor_rounding,
            replay_prefix_lens,
        )

        K_replay = max(1, int(getattr(cfg.model, "ckpt_full_every", 1)))
        anchor0 = (0 if al_state is None
                   else int(al_state.get("round", round_id)))
        for ri, ln in enumerate(replay_prefix_lens(j, al_state, round_id,
                                                   len(train_inds))):
            state = self._retrain(spec, state, tx, train_inds[:ln],
                                  cfg.model.epochs)
            if (anchor0 + ri + 1) % K_replay == 0:
                adopt_anchor_rounding(state, cfg.model)

        from nnal_tpu.core.profiling import PhaseTimer

        # same per-phase JSONL stream as the patch-wise engines (§5.1)
        timer = PhaseTimer(j.path("phases.jsonl"))
        # entry state is reproducible as-is (anchor ckpt or replay above)
        last_full_round = round_id

        while n_queries < max_queries and len(pool_inds) > 0:
            k = min(cfg.query.k, max_queries - n_queries, len(pool_inds))
            qrng = self.rng.fold(f"q-{method_name}-{run}-{round_id}")
            from nnal_tpu.data.image_pool import LazyPoolView

            committee = None
            if method_name in ("ensemble", "QBC-JS"):
                with timer.phase("committee"):
                    committee = self._build_committee(spec, state, tx,
                                                      train_inds, round_id)
            ctx = ClsQueryContext(
                spec=spec, params=state.params,
                pool_x=LazyPoolView(self._pool, pool_inds),
                k=k, rng=qrng.host, B=cfg.query.B, lambda_=cfg.query.lambda_,
                batch=cfg.query.ntb, MC_iters=cfg.query.MC_iters,
                labeled_x=LazyPoolView(self._pool, train_inds),
                labeled_y=np.asarray(self._pool.labels)[train_inds],
                committee_params=committee,
                bn=state.bn_state or None,
                extra={"damping": float(getattr(cfg.query, "damping", 0.1)),
                       "influence_mode": cfg.query.influence_mode,
                       "arnoldi_rank": cfg.query.arnoldi_rank})
            with timer.phase("score_select"):
                q_pos = cls_query(ctx, method_name)
            q_inds = pool_inds[q_pos]

            j.record_queries(round_id, q_inds)
            train_inds = np.concatenate([train_inds, q_inds])
            pool_inds = np.delete(pool_inds, q_pos)
            j.init_membership(train_inds, pool_inds)
            n_queries += len(q_inds)
            round_id += 1

            with timer.phase("train"):
                state = self._retrain(spec, state, tx, train_inds,
                                      cfg.model.epochs)

            with timer.phase("eval"):
                preds = batched_forward(
                    spec, state.params,
                    LazyPoolView(self._pool, test_inds),
                    cfg.query.ntb, ("prediction",),
                    state=state.bn_state or None)["prediction"]
                acc = accuracy(preds, self._pool.labels[test_inds])
            j.append_eval([acc], "accs.txt")
            with open(j.path("predicts.txt"), "a") as f:
                f.write(" ".join(str(int(p)) for p in preds) + "\n")

            with timer.phase("checkpoint"):
                # anchor rounds write the full resume point; in between,
                # ckpt_full_every > 1 skips the pull (resume replays)
                K = max(1, int(getattr(cfg.model, "ckpt_full_every", 1)))
                if round_id % K == 0:
                    # anchor-payload levers (engine.common): capture
                    # originals, adopt the rounded values (bit-identity),
                    # save the originals at the anchor dtype
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
                    last_full_round = round_id
            timer.commit_round(round_id - 1, n_train=len(train_inds),
                               n_pool=len(pool_inds), accuracy=float(acc))
            j.save_state(round_id=round_id, rng_state=self.rng.state(),
                         n_train=len(train_inds), n_pool=len(pool_inds))

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
        return {"n_queries": n_queries,
                "accs": j.load_evals("accs.txt"),
                "train_inds": train_inds, "pool_inds": pool_inds}

    # ------------------------------------------------------------- run mgmt
    def get_runs(self):
        """Run folders of this experiment, ordered (reference ``get_runs``,
        AL.py:112-123; we restrict to digit-named dirs since the root also
        holds ``parameters.txt``)."""
        return sorted((d for d in os.listdir(self.root_dir)
                       if d.isdigit()
                       and os.path.isdir(os.path.join(self.root_dir, d))),
                      key=int)

    def organize_runs(self) -> None:
        """Renumber run folders to 0..n-1 (reference ``organize_runs``,
        AL.py:133-145)."""
        for i, name in enumerate(self.get_runs()):
            if i != int(name):
                os.rename(os.path.join(self.root_dir, name),
                          os.path.join(self.root_dir, str(i)))

    def remove_run(self, run: int) -> None:
        """Delete a run folder and renumber the rest (reference
        ``remove_run``, AL.py:125-131)."""
        import shutil

        shutil.rmtree(self._run_dir(int(run)))
        self.organize_runs()

    def reset_method(self, method_name: str, run: int) -> None:
        """Wipe one (run, method) back to the run's initial membership and
        weights (reference ``reset_method``, AL.py:502-515)."""
        import shutil

        mdir = os.path.join(self._run_dir(run), method_name)
        if os.path.exists(mdir):
            shutil.rmtree(mdir)
        self.add_method(method_name, run)

    def read_queries(self, method_name: str, run: int):
        """Per-iteration query counts, iteration-ordered (reference
        ``read_queries``, AL.py:517-533 — which listed the directory
        unordered and crashed on 1-query files via ``len(0-d array)``;
        ``load_inds`` here is atleast-1d so k=1 rounds count correctly)."""
        j = MethodJournal(self._run_dir(run), method_name)
        return [len(load_inds(os.path.join(j.queries_dir, f"{it}.txt")))
                for it in j.query_iters()]

    def eval_run(self, run: int, eval_method: str = "accuracy",
                 save: bool = True) -> Dict[str, np.ndarray]:
        """Recompute per-iteration metric curves from each method's saved
        ``predicts.txt`` against the run's ground-truth test labels
        (reference ``eval_run``, AL.py:535-587).  ``accuracy`` writes a
        (rounds,) curve; ``PR`` writes a (2, rounds) example-based
        precision/recall matrix — both to ``accs.txt`` when ``save``."""
        rdir = self._run_dir(run)
        test_inds = load_inds(os.path.join(rdir, "test_inds.txt"))
        test_labels = np.asarray(self._pool.labels)[test_inds]
        methods = [d for d in os.listdir(rdir)
                   if os.path.isdir(os.path.join(rdir, d))
                   and os.path.exists(os.path.join(rdir, d, "predicts.txt"))]
        out: Dict[str, np.ndarray] = {}
        for method in methods:
            yhat = np.loadtxt(os.path.join(rdir, method, "predicts.txt"),
                              dtype=np.int64, ndmin=2)
            if eval_method == "accuracy":
                crit = np.array([accuracy(yhat[i], test_labels)
                                 for i in range(yhat.shape[0])])
            elif eval_method == "PR":
                from nnal_tpu.evaluation.metrics import example_based_pr

                nclass = self.config.model.nclass
                lab_hot = make_onehot(test_labels, nclass)
                crit = np.zeros((2, yhat.shape[0]))
                for i in range(yhat.shape[0]):
                    crit[:, i] = example_based_pr(
                        make_onehot(yhat[i], nclass), lab_hot)
            else:
                raise ValueError(f"unknown eval_method {eval_method!r}")
            if save:
                np.savetxt(os.path.join(rdir, method, "accs.txt"), crit)
            out[method] = crit
        return out

    # ------------------------------------------------------------- analysis
    def read_run(self, run: int, method_name: str) -> np.ndarray:
        """Accuracy curve for one (run, method) (reference ``read_run``,
        AL.py:590)."""
        return MethodJournal(self._run_dir(run),
                             method_name).load_evals("accs.txt")

    def visualize_run(self, run: int, method_names, save_path: str) -> None:
        """Accuracy-vs-#queries curves for one run (reference
        ``visualize_run``, AL.py:626-678)."""
        from nnal_tpu.evaluation.visualize import plot_learning_curves

        curves = {m: self.read_run(run, m) for m in method_names
                  if len(self.read_run(run, m))}
        plot_learning_curves(curves, self.config.query.k, save_path,
                             ylabel="test accuracy")

    def summarize_all(self, method_names) -> Dict[str, np.ndarray]:
        """Mean accuracy curves across runs (reference ``summarize_all``,
        AL.py:679)."""
        runs = sorted(int(d) for d in os.listdir(self.root_dir)
                      if d.isdigit())
        out = {}
        for m in method_names:
            curves = [self.read_run(r, m) for r in runs
                      if os.path.exists(os.path.join(self._run_dir(r), m))]
            if curves:
                L = min(len(c) for c in curves)
                out[m] = np.mean([c[:L] for c in curves], axis=0)
        return out
