"""Classification-engine campaigns on the local chip -> CLS_CAMPAIGNS_r{N}.json.

Hardware evidence for the classification engine's FULL strategy surface —
the reference set (random/entropy/rep-entropy/fi/egl, NNAL.py:188-525) plus
the rebuild extras (BADGE, MC-entropy, BALD, BatchBALD, ensemble, QBC-JS,
core-set, influence).  Protocol: an 8-class oriented-grating pool (6,000
16x16 images, sigma-1.0 noise), PW CNN, 5 rounds of k=32 from a
class-balanced 32-seed; every method shares ONE run (same partition, same
init weights), so curves are directly comparable.  Difficulty was tuned so
the curves DISCRIMINATE (a 4-class/sigma-0.7 pilot saturated every method
at acc 1.0 by round 2): at sigma 1.0 a warm-started random campaign
walks 0.29 -> 0.70 -> 0.86 -> 0.96 over the five rounds, so there is
headroom in both directions at every budget.

Run: ``python benchmarks/cls_campaigns.py [round_tag] [method ...]``
(default: all 13; the JSON is upserted after each method, so partial runs
are recorded).
"""

from __future__ import annotations

import json
import pathlib
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnal_tpu.core.platform import honor_env_platforms  # noqa: E402

honor_env_platforms()

import numpy as np  # noqa: E402

PARS = {
    "model_name": "PW", "nclass": 8, "patch_shape": (16, 16, 1),
    # epochs: the r03 campaign-protocol lesson (CLAUDE.md) — with 32-160
    # labels and b=32, one epoch is 1-5 Adam steps; 15 epochs keeps the
    # model out of its initial one-class regime at every budget
    "k": 32, "B": 200, "ntb": 1024, "b": 32, "epochs": 15, "MC_iters": 8,
    "learning_rate": 1e-3, "optimizer_name": "Adam", "dropout_rate": 0.5,
    "init_size": 32, "test_ratio": 0.2, "n_ensemble": 3, "seed": 11,
    "sigma": 1.0,   # dataset noise (not an engine key; popped in main)
    # one full (params+Adam) resume pull at the final round only — the
    # ~280 MB PW-at-16x16 checkpoint costs ~14 s/round over the tunnel
    # (CLAUDE.md transfer economics) and the campaign measures querying,
    # not checkpoint IO
    "ckpt_full_every": 5,
}
MAX_QUERIES = 160          # 5 rounds of k=32

METHODS = ["random", "entropy", "rep-entropy", "fi", "egl", "BADGE",
           "MC-entropy", "BALD", "BatchBALD", "ensemble", "QBC-JS",
           "core-set", "influence"]

# NNAL_REPEAT=N repeats the whole campaign N times (engine seed 11+rep,
# fresh partition + init weights + balanced-seed draw per repeat; the
# DATASET stays fixed so the task is identical) and commits mean+-std
# accuracy curves — the reference's repeated-runs methodology
# (resetting_run.py:10-101, AL.py:679 summarize_all).  Rows carry
# acc (mean), acc_std, acc_runs, n_runs; method tag gets "@xN".
_REPEAT = int(os.environ.get("NNAL_REPEAT", "1") or 1)

# NNAL_PARS="MC_iters=32" applies protocol overrides (reference-style
# set_parameters parser); NNAL_TAG appends a variant suffix so the row
# is distinguishable (e.g. BALD@cc@x5@T32).
_PARS_OVER = os.environ.get("NNAL_PARS", "").strip()
_TAG = os.environ.get("NNAL_TAG", "").strip()

_CC = os.environ.get("NNAL_COMPILE_CACHE", "").strip()
_CC_ON = _CC.lower() not in ("", "0", "off", "none")
if _CC_ON:
    from nnal_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()


def make_dataset(n=6000, nclass=8, hw=16, sigma=1.0, seed=0):
    """Oriented gratings (one orientation per class, random phase) under
    heavy additive noise — learnable from tens of labels by a small CNN,
    yet hard enough that warm-started random AL reaches only ~0.96
    test accuracy after 5 rounds (0.29 at the 32-seed)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, nclass, n)
    xs = np.zeros((n, hw, hw, 1), np.float32)
    yy, xx = np.mgrid[0:hw, 0:hw]
    angles = np.pi * np.arange(nclass) / nclass
    for c in range(nclass):
        m = y == c
        phase = rng.uniform(0, 2 * np.pi, int(m.sum()))[:, None, None]
        t = np.cos(angles[c]) * xx + np.sin(angles[c]) * yy
        xs[m, :, :, 0] = np.sin(2 * np.pi * t[None] / 6.0 + phase)
    xs += rng.normal(0, sigma, xs.shape)
    return xs.astype(np.float32), y.astype(np.int64)


def _balanced_init(run_dir, labels, per_class, seed=0):
    """Rewrite the run's init train/pool split as a class-covering seed
    (same harness choice as campaigns._balanced_seed: a score/committee
    built on a labeled set missing classes degenerates at tiny budgets)."""
    from nnal_tpu.core.journal import load_inds, save_inds

    train = load_inds(os.path.join(run_dir, "init_train_inds.txt"))
    pool = load_inds(os.path.join(run_dir, "init_pool_inds.txt"))
    avail = np.concatenate([train, pool])
    rng = np.random.default_rng(seed)
    picks = []
    for c in range(int(labels.max()) + 1):
        cand = avail[labels[avail] == c]
        picks.append(rng.permutation(cand)[:per_class])
    new_train = np.concatenate(picks)
    save_inds(os.path.join(run_dir, "init_train_inds.txt"), new_train)
    save_inds(os.path.join(run_dir, "init_pool_inds.txt"),
              np.setdiff1d(avail, new_train))


def _phase_totals(run_dir, method):
    path = os.path.join(run_dir, method, "phases.jsonl")
    tot = {}
    if os.path.exists(path):
        for line in open(path):
            rec = json.loads(line)
            for k, v in rec.items():
                if isinstance(v, float):
                    tot[k] = tot.get(k, 0.0) + v
    return {k: round(v, 1) for k, v in tot.items()
            if k not in ("accuracy",)}


def _upsert(rows, rec):
    for i, r in enumerate(rows):
        if r.get("method") == rec["method"]:
            rows[i] = rec
            return
    rows.append(rec)


def main():
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment

    args = sys.argv[1:]
    is_tag = lambda a: re.fullmatch(r"r\d+", a) is not None  # noqa: E731
    tag = args[0] if args and is_tag(args[0]) else "r03"
    methods = [a for a in args if not is_tag(a)] or METHODS
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"CLS_CAMPAIGNS_{tag}.json")
    note = ("Classification-engine campaigns on real hardware: "
            "8-class oriented-grating pool (6,000 16x16 images, "
            "sigma-1.0 noise — tuned so curves discriminate; the "
            "4-class/sigma-0.7 pilot saturated at acc 1.0 by round 2), "
            "PW CNN, 5 rounds of k=32 from a class-balanced 32-seed, "
            "epochs=15 @ lr 1e-3, n_ensemble=3, MC_iters=8, B=200, "
            "ckpt_full_every=5. All methods share one run (identical "
            "partition + init weights). Wall times include one-time XLA "
            "compiles; acc is the test-accuracy curve (1,200 held-out).")
    out = {
        "hardware": "TPU v5e (axon tunnel, single chip)",
        "note": note,
        "methods": [],
    }
    if os.path.exists(path):
        prev = json.load(open(path))
        # rows from a different protocol are not comparable — start fresh
        if prev.get("note") == note:
            out = prev

    base = dict(PARS)
    if _PARS_OVER:
        # apply overrides BEFORE building the dataset: sigma/nclass are
        # dataset-shaping keys, and applying them after make_dataset
        # would tag the row as a variant measured on the unchanged data
        # (the silently-ignored-config defect class, r02 fi diag_load)
        from nnal_tpu.core.config import set_parameters

        PARS.update(set_parameters(PARS, _PARS_OVER))
        base.update(set_parameters(base, _PARS_OVER))
    sigma = base.pop("sigma")
    X, y = make_dataset(nclass=base["nclass"], sigma=sigma, seed=7)
    tag_sfx = ("@cc" if _CC_ON else "") + (
        f"@x{_REPEAT}" if _REPEAT > 1 else "") + (
        f"@{_TAG}" if _TAG else "")
    runs = {m: [] for m in methods}   # method -> [(wall, accs, rec0)]
    for rep in range(_REPEAT):
        pars = dict(base, seed=base["seed"] + rep)
        with tempfile.TemporaryDirectory() as root:
            cfg = ExperimentConfig.from_pars(pars)
            expr = Experiment(root, cfg)
            expr.attach_data(X, y)
            run = expr.add_run()
            _balanced_init(os.path.join(root, str(run)), y,
                           PARS["init_size"] // PARS["nclass"], seed=rep)
            for m in methods:
                expr.add_method(m, run)
                t0 = time.perf_counter()
                res = expr.run_method(m, run, MAX_QUERIES)
                dt = time.perf_counter() - t0
                accs = [float(v)
                        for v in np.atleast_1d(res["accs"]).ravel()]
                rec0 = {"method": m + tag_sfx,
                        "queries": int(res["n_queries"]),
                        "phase_s": _phase_totals(
                            os.path.join(root, str(run)), m)}
                runs[m].append((dt, accs, rec0))
                # upsert the aggregate-so-far after every campaign so
                # partial sweeps are still recorded
                _upsert(out["methods"], _cls_rec(runs[m]))
                pathlib.Path(path).write_text(
                    json.dumps(out, indent=1) + "\n")
                print(json.dumps(_cls_rec(runs[m])), flush=True)
    print("wrote", path)


def _cls_rec(rows):
    """Aggregate per-repeat (wall, accs, rec) into one row: mean curve
    on the standard 'acc' key, std + per-run curves alongside (phase_s
    from the LAST repeat — warm steady state)."""
    walls = [w for w, _, _ in rows]
    lens = [len(a) for _, a, _ in rows]
    L = min(lens)
    A = np.stack([np.asarray(a[:L], float) for _, a, _ in rows])
    rec = dict(rows[-1][2])
    rec["wall_s"] = round(float(np.mean(walls)), 1)
    rec["acc"] = [round(float(v), 4) for v in A.mean(0)]
    if len(rows) > 1:
        rec["n_runs"] = len(rows)
        if len(set(lens)) > 1:
            # no silent caps: a shortened repeat truncates the mean curve
            rec["curve_lens"] = lens
        rec["wall_runs"] = [round(w, 1) for w in walls]
        rec["acc_std"] = [round(float(v), 4) for v in A.std(0, ddof=1)]
        rec["acc_runs"] = [[round(float(v), 4) for v in a] for a in A]
    return rec


if __name__ == "__main__":
    main()
