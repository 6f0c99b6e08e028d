"""Real-scale engine campaigns on the local chip -> CAMPAIGNS_r{N}.json.

Same protocol as the r02 artifact: 128x128x32 volumes, 2 modalities,
grid_spacing 2 (131K-patch pools), PW1 25x25x2, 2 rounds of k=32,
n_ensemble=3, synthetic subjects with 10 blobs (dense enough for nonzero
F-curves).  Wall times include one-time XLA compiles.

Run: ``python benchmarks/campaigns.py [round_tag] [method ...]``
(default: the full method set; each campaign appends into the JSON as it
finishes, so partial runs are still recorded).
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

SHAPE = (128, 128, 32)
# The campaign's labeled sets are tiny (16-80), so with b=64 one epoch is
# 1-2 Adam steps: at epochs<=3 the model never leaves its initial
# all-one-class regime and F pins to 0 — bit-identically at the r02 and
# r03 code states, i.e. a protocol property, not a regression.  A chip
# capacity sweep (64 labels: 3 epochs F=0.22, 15 epochs F=0.89) sets
# epochs=15; the scanned finetune makes the extra epochs nearly free
# (one dispatch per round either way).
PARS = {
    "model_name": "PW", "nclass": 2, "patch_shape": (25, 25, 1),
    "grid_spacing": 2, "k": 32, "B": 128, "ntb": 4096, "b": 64,
    "epochs": 15, "MC_iters": 5, "learning_rate": 1e-3,
    "optimizer_name": "Adam", "dropout_rate": 0.5, "init_size": 16,
    "n_ensemble": 3, "seed": 11, "dtype": "bfloat16",
}
MULTI_METHODS = ["fi", "core-set", "ensemble", "influence", "entropy"]
# BADGE and BatchBALD are TPU-native extra strategies (gradient-embedding
# k-means++ / greedy joint MI); their multi-subject paths are covered by
# the CPU tests — one single-subject hardware row each is enough evidence
SINGLE_METHODS = ["rep-entropy", "BALD", "AU_4U", "SuPix", "QBC-JS",
                  "BADGE", "BatchBALD"]

# NNAL_CKPT_EVERY=K runs the campaign with anchored checkpoints (the full
# ~0.5 GB resume pull every K rounds instead of every round; crash-resume
# replays from the anchor, see config.model.ckpt_full_every).  The method
# is then recorded as "<name>@ckptK" so both variants can coexist in the
# artifact.
_CKPT_EVERY = int(os.environ.get("NNAL_CKPT_EVERY", "1"))
if _CKPT_EVERY > 1:
    PARS["ckpt_full_every"] = _CKPT_EVERY

# NNAL_HIST_F16=1 stores the multi engine's per-iteration history
# checkpoints in float16 (config.model.hist_dtype), halving the per-round
# device->host pull; recorded as "<name>@...h16".
_HIST_F16 = os.environ.get("NNAL_HIST_F16", "") == "1"
if _HIST_F16:
    PARS["hist_dtype"] = "float16"

# NNAL_HIST_EVERY=H writes the per-iteration history checkpoint only every
# H rounds (0 = never; config.model.hist_every) — with anchored checkpoints
# this zeroes the tunnel pull on non-anchor rounds; recorded as
# "<name>@...heH".
_HIST_EVERY = int(os.environ.get("NNAL_HIST_EVERY", "1"))
if _HIST_EVERY != 1:
    PARS["hist_every"] = _HIST_EVERY

# NNAL_TRAIN_DTYPE=bfloat16 runs the campaign's finetunes mixed-precision
# (config.model.train_dtype: bf16 compute, f32 master params); recorded as
# "<name>@bf16t" so the quality (F-curve) can be compared against the f32
# row directly.
_TRAIN_DTYPE = os.environ.get("NNAL_TRAIN_DTYPE", "").strip()
if _TRAIN_DTYPE:
    PARS["train_dtype"] = _TRAIN_DTYPE

# NNAL_INFLUENCE_MODE=arnoldi runs influence campaigns with the low-rank
# Lanczos s_test (config.query.influence_mode; NNAL_ARNOLDI_RANK sets the
# rank, default 8); recorded as "influence@arnoldi<r>".
_INFL_MODE = os.environ.get("NNAL_INFLUENCE_MODE", "").strip()
_ARNOLDI_RANK = int(os.environ.get("NNAL_ARNOLDI_RANK", "8"))
if _INFL_MODE:
    PARS["influence_mode"] = _INFL_MODE
    PARS["arnoldi_rank"] = _ARNOLDI_RANK

# NNAL_CKPT_DTYPE=bfloat16 stores the resume anchors in bf16 (halved
# device->host pull; bit-identical crash-resume via adoption, see
# config.model.ckpt_dtype); recorded as "<name>@...abf16".
_CKPT_DTYPE = os.environ.get("NNAL_CKPT_DTYPE", "").strip()
if _CKPT_DTYPE:
    PARS["ckpt_dtype"] = _CKPT_DTYPE

# NNAL_OPT_RESET=1 warm-restarts the optimizer each round's finetune —
# anchors then skip the Adam-moment leaves (2/3 of the payload; see
# config.model.opt_reset_per_round); recorded as "<name>@...or".
_OPT_RESET = os.environ.get("NNAL_OPT_RESET", "") == "1"
if _OPT_RESET:
    PARS["opt_reset_per_round"] = True

# NNAL_MT=<coeff> turns on mean-teacher SSL (config consistency_coeff;
# ramp/measure via NNAL_MT_RAMP / NNAL_MT_MEASURE), the semi-supervised
# signal from the unlabeled pool; recorded as "<name>@...mt".
_MT = float(os.environ.get("NNAL_MT", "0") or 0)
if _MT > 0:
    PARS["consistency_coeff"] = _MT
    PARS["consistency_ramp"] = int(os.environ.get("NNAL_MT_RAMP", "30"))
    PARS["consistency_measure"] = os.environ.get("NNAL_MT_MEASURE", "MSE")
    PARS["ema_decay"] = float(os.environ.get("NNAL_MT_EMA", "0.99"))
# NNAL_MT_OFF=<labels>: consistency ramp-down — coefficient decays with
# the labeled count and switches off at <labels> (config
# consistency_off_labels; fixes the r04 end-of-curve MT crossover)
_MT_OFF = int(os.environ.get("NNAL_MT_OFF", "0") or 0)
if _MT_OFF > 0:
    PARS["consistency_off_labels"] = _MT_OFF
# NNAL_MT_START=<labels>: delay consistency until the labeled set
# reaches <labels> (config consistency_start_labels — the round-0-dip
# counter-lever)
_MT_START = int(os.environ.get("NNAL_MT_START", "0") or 0)
if _MT_START > 0:
    PARS["consistency_start_labels"] = _MT_START

# NNAL_PARS="k=8,init_size=8" applies arbitrary protocol overrides via
# the reference-style set_parameters parser; NNAL_TAG appends a custom
# variant suffix so the row is distinguishable in the artifact.
_PARS_OVER = os.environ.get("NNAL_PARS", "").strip()
_TAG = os.environ.get("NNAL_TAG", "").strip()

# NNAL_REPEAT=N repeats every campaign N times (seed 11+rep for the
# engine streams + init weights, rep for the balanced seed draw; the
# SUBJECTS stay fixed so the task is identical) and commits mean+-std
# curves — the reference's own repeated-runs methodology
# (resetting_run.py:10-101, AL.py:679 summarize_all), which single-run
# rows cannot substitute for at the protocol's ±0.05-0.1 run variance.
_REPEAT = int(os.environ.get("NNAL_REPEAT", "1") or 1)
if _PARS_OVER:
    from nnal_tpu.core.config import set_parameters

    PARS.update(set_parameters(PARS, _PARS_OVER))

# NNAL_COMPILE_CACHE=<dir> enables the persistent XLA compilation cache
# for the campaign (second run with the same dir skips remote compiles);
# recorded as "<name>@...cc" so cold and warm rows can coexist.
_CC = os.environ.get("NNAL_COMPILE_CACHE", "").strip()
_CC_ON = _CC.lower() not in ("", "0", "off", "none")
if _CC_ON:
    from nnal_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()


def _method_tag(method):
    tag = method
    if _CKPT_EVERY > 1:
        tag += f"@ckpt{_CKPT_EVERY}"
    if _HIST_F16:
        tag += "@h16" if "@" not in tag else "h16"
    if _HIST_EVERY != 1:
        tag += (f"@he{_HIST_EVERY}" if "@" not in tag
                else f"he{_HIST_EVERY}")
    if _CC_ON:
        tag += "@cc" if "@" not in tag else "cc"
    if _TRAIN_DTYPE in ("bfloat16", "bf16"):
        tag += "@bf16t" if "@" not in tag else "bf16t"
    if _INFL_MODE == "arnoldi" and method == "influence":
        tag += (f"@arnoldi{_ARNOLDI_RANK}" if "@" not in tag
                else f"arnoldi{_ARNOLDI_RANK}")
    if _CKPT_DTYPE in ("bfloat16", "bf16"):
        tag += "@abf16" if "@" not in tag else "abf16"
    elif _CKPT_DTYPE == "int8":
        tag += "@ai8" if "@" not in tag else "ai8"
    if _OPT_RESET:
        tag += "@or" if "@" not in tag else "or"
    if _MT > 0:
        tag += "@mt" if "@" not in tag else "mt"
        if _MT_OFF > 0:
            tag += f"off{_MT_OFF}"
        if _MT_START > 0:
            tag += f"st{_MT_START}"
    if _REPEAT > 1:
        tag += f"@x{_REPEAT}" if "@" not in tag else f"x{_REPEAT}"
    if _TAG:
        tag += f"@{_TAG}" if "@" not in tag else _TAG
    return tag


def _finish_rec(rec, runs):
    """Fold a list of per-repeat (wall_s, perf) into the record: the
    mean curve rides the standard 'perf' key; std/min/max + per-run
    curves land alongside so quality claims carry their error bars.
    phase_s/phase_rounds in the record are from the LAST repeat (warm
    steady state — repeat 1 additionally pays the per-process compile
    loads)."""
    walls = [w for w, _ in runs]
    perfs = [np.asarray(p, float) for _, p in runs]
    lens = [len(p) for p in perfs]
    L = min(lens)
    P = np.stack([p[:L] for p in perfs])
    rec["wall_s"] = round(float(np.mean(walls)), 1)
    rec["perf"] = [round(float(v), 3) for v in P.mean(0)]
    if len(runs) > 1:
        rec["n_runs"] = len(runs)
        if len(set(lens)) > 1:
            # no silent caps: a shortened repeat truncates the mean curve
            rec["curve_lens"] = lens
        rec["wall_runs"] = [round(w, 1) for w in walls]
        rec["perf_std"] = [round(float(v), 3) for v in P.std(0, ddof=1)]
        rec["perf_runs"] = [[round(float(v), 3) for v in p] for p in P]
    return rec


def _subjects(n, seed0=0):
    from nnal_tpu.data.io import synthetic_subject

    return [synthetic_subject(shape=SHAPE, n_modalities=2, n_blobs=10,
                              seed=seed0 + s) for s in range(n)]


def _upsert(rows, rec):
    """Replace an existing record for the same method (re-runs refresh
    rather than duplicate rows) or append a new one."""
    for i, r in enumerate(rows):
        if r.get("method") == rec["method"]:
            rows[i] = rec
            return
    rows.append(rec)


def _phase_totals(root, method):
    """Aggregate the engine's per-round phases.jsonl into phase -> seconds
    (read before the tempdir is discarded) so the artifact explains its
    own wall time — e.g. how much is selection vs finetune vs test eval."""
    path = os.path.join(root, method, "phases.jsonl")
    tot = {}
    if os.path.exists(path):
        for line in pathlib.Path(path).read_text().splitlines():
            rec = json.loads(line)
            for k, v in rec.items():
                if isinstance(v, float):
                    tot[k] = tot.get(k, 0.0) + v
                elif k == "sub" and isinstance(v, dict):
                    # strategy-internal sub-phase spans (fi/gather_grads_A,
                    # fi/sdp, ...) — the select-tail profile the r03
                    # verdict asked for, aggregated over rounds
                    for sk, sv in v.items():
                        tot[f"sub/{sk}"] = tot.get(f"sub/{sk}", 0.0) + sv
    return {k: round(v, 1) for k, v in tot.items()
            if k not in ("f_measure",)}


def _phase_rounds(root, method):
    """Raw per-round phase records — round 1 carries the per-process
    executable loads (compile-cache deserialization), so steady-state
    comparisons should read round >= 2."""
    path = os.path.join(root, method, "phases.jsonl")
    if not os.path.exists(path):
        return []
    return [json.loads(line)
            for line in pathlib.Path(path).read_text().splitlines()]


def _balanced_seed(pool_positions, labels_of_pool, n=16, seed=0):
    """Class-covering seed set (n/2 per class), the standard AL-benchmark
    practice: a uniform 16-draw from a ~12%-positive pool has a ~12%
    chance of zero positives per method, and a committee/score built on a
    single-class labeled set degenerates (selects more background
    forever, F pinned to 0 — observed for QBC-JS/fi/ensemble in the
    first r03 run).  Oracle-seeded init is a harness choice, not an
    engine feature."""
    rng = np.random.default_rng(seed)
    picks = []
    for cls in (0, 1):
        cand = pool_positions[labels_of_pool == cls]
        picks.append(rng.permutation(cand)[: n // 2])
    return np.concatenate(picks)


def run_single(method, out):
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.patches import gather_labels
    from nnal_tpu.engine.pw_experiment import PWExperiment

    runs, rec = [], None
    for rep in range(_REPEAT):
        with tempfile.TemporaryDirectory() as root:
            pars = dict(PARS, seed=PARS["seed"] + rep)
            cfg = ExperimentConfig.from_pars(pars)
            expr = PWExperiment(root, cfg)
            vols, mask = _subjects(1)[0]
            expr.attach_subject(vols, mask)
            expr.prep_data()
            j = expr.add_method(method, init_size=0)
            _, pool = j.membership()
            lab = np.asarray(gather_labels(mask, pool,
                                           tuple(vols[0].shape)))
            seed_inds = _balanced_seed(pool, lab, PARS["init_size"],
                                       seed=rep)
            j.init_membership(seed_inds, np.setdiff1d(pool, seed_inds))
            t0 = time.perf_counter()
            res = expr.run_method(method, 64)
            dt = time.perf_counter() - t0
            runs.append((dt, [float(v) for v in res["perf"]]))
            rec = {"method": _method_tag(method),
                   "queries": int(res["n_queries"]),
                   "phase_s": _phase_totals(root, method),
                   "phase_rounds": _phase_rounds(root, method)}
    rec = _finish_rec(rec, runs)
    _upsert(out["single_subject"], rec)
    print(json.dumps(rec), flush=True)


def run_multi(method, out):
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    runs, rec = [], None
    for rep in range(_REPEAT):
        with tempfile.TemporaryDirectory() as root:
            pars = dict(PARS, seed=PARS["seed"] + rep)
            cfg = ExperimentConfig.from_pars(pars)
            expr = MultiImgExperiment(root, cfg)
            subs = _subjects(3)
            test = _subjects(1, seed0=9)
            expr.attach_subjects(subs, test_subjects=test)
            expr.prep_data()
            j = expr.add_method(method)
            # balanced seed set from subject 0 (global pool position ==
            # local position for subject 0); see _balanced_seed for why
            from nnal_tpu.core.journal import load_inds
            from nnal_tpu.data.patches import gather_labels

            pools0 = load_inds(expr._p("pool_inds_0.txt"))
            lab0 = np.asarray(gather_labels(
                subs[0][1], pools0,
                tuple(np.asarray(subs[0][0][0]).shape)))
            seed = _balanced_seed(np.arange(len(pools0)), lab0,
                                  PARS["init_size"], seed=rep)
            _, pg = j.membership()
            j.init_membership(seed, np.setdiff1d(pg, seed))
            t0 = time.perf_counter()
            res = expr.run_method(method, 64)
            dt = time.perf_counter() - t0
            runs.append((dt, [float(v) for v in res["perf"]]))
            rec = {"method": _method_tag(method),
                   "queries": int(res["n_queries"]),
                   "phase_s": _phase_totals(root, method),
                   "phase_rounds": _phase_rounds(root, method)}
    rec = _finish_rec(rec, runs)
    _upsert(out["multi_subject_3x"], rec)
    print(json.dumps(rec), flush=True)


def run_fcn(method, out):
    """Dense-model (Tiramisu) AL campaign — the v2 family inside the
    product loop (round-3 verdict #7): whole-slice dense pool scoring +
    queried-voxel-masked dense finetunes via the SAME PWExperiment
    engine.  Row key "fcn-<method>" in the single_subject section."""
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.patches import gather_labels
    from nnal_tpu.engine.pw_experiment import PWExperiment

    runs, rec = [], None
    for rep in range(_REPEAT):
        with tempfile.TemporaryDirectory() as root:
            pars = dict(PARS, seed=PARS["seed"] + rep)
            pars.update({
                "model_name": "Tiramisu",
                # a mid-size FC-DenseNet (the 103-layer config is
                # serving-proven in INFERENCE_r03; campaigns use a
                # lighter stack so the row measures the AL loop, not one
                # giant compile)
                "model_kwargs": {"growth": 8, "depths": [3, 4, 5]},
                # dense training from a handful of supervised voxels
                # needs more optimization per round than the patch
                # model, and a larger balanced seed: 16 voxels over
                # 128x128 slices left the FCN in its all-positive regime
                # (F pinned at 0.22); 64 balanced seeds + per-round
                # BN-stat refresh give a working start (CPU probes:
                # F 0.83 from 48 seeds at 64^2)
                "dropout_rate": 0.1, "b": 4, "epochs": 25,
                "init_size": 64,
            })
            cfg = ExperimentConfig.from_pars(pars)
            expr = PWExperiment(root, cfg)
            vols, mask = _subjects(1)[0]
            expr.attach_subject(vols, mask)
            expr.prep_data()
            j = expr.add_method(method, init_size=0)
            _, pool = j.membership()
            lab = np.asarray(gather_labels(mask, pool,
                                           tuple(vols[0].shape)))
            seed_inds = _balanced_seed(pool, lab, pars["init_size"],
                                       seed=rep)
            j.init_membership(seed_inds, np.setdiff1d(pool, seed_inds))
            t0 = time.perf_counter()
            # 4 rounds of k=32: enough for a visible dense Dice curve
            res = expr.run_method(method, 128)
            dt = time.perf_counter() - t0
            runs.append((dt, [float(v) for v in res["perf"]]))
            rec = {"method": _method_tag(f"fcn-{method}"),
                   "queries": int(res["n_queries"]),
                   "phase_s": _phase_totals(root, method),
                   "phase_rounds": _phase_rounds(root, method)}
    rec = _finish_rec(rec, runs)
    _upsert(out["single_subject"], rec)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    args = sys.argv[1:]
    # a round tag is r<digits> ("r03"), NOT any r-word — "rep-entropy" and
    # "random" are methods
    is_tag = lambda a: re.fullmatch(r"r\d+", a) is not None
    tag = args[0] if args and is_tag(args[0]) else "r03"
    methods = [a for a in args if not is_tag(a)] or None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"CAMPAIGNS_{tag}.json")
    out = {
        "hardware": "TPU v5e (axon tunnel, single chip)",
        "note": ("Full engine campaigns on real hardware: 128x128x32 "
                 "volumes, 2 modalities, grid_spacing 2 (131K-patch "
                 "pools), PW1 25x25x2, 2 rounds of k=32, epochs=15 @ "
                 "lr 1e-3, n_ensemble=3, 10-blob subjects. "
                 "All methods start from the same class-balanced 16-seed "
                 "(8 per class, oracle-seeded — see _balanced_seed). "
                 "Wall times "
                 "include one-time XLA compiles; phase_s breaks each "
                 "campaign into committee/score_select/train/eval from "
                 "the engine's phases.jsonl. Unlike the r02 artifact, "
                 "multi-subject rows run a per-round test-subject "
                 "evaluation (the perf column), so their wall times are "
                 "not comparable to r02's."),
        "multi_subject_3x": [], "single_subject": [],
    }
    if os.path.exists(path):
        out = json.load(open(path))
    for m in (methods or MULTI_METHODS):
        if m in MULTI_METHODS:
            run_multi(m, out)
            pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")
    for m in (methods or SINGLE_METHODS):
        if m in SINGLE_METHODS:
            run_single(m, out)
            pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")
    for m in (methods or []):
        # dense-model rows are opt-in: "fcn-entropy", "fcn-BALD", ...
        if m.startswith("fcn-"):
            run_fcn(m[len("fcn-"):], out)
            pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")
    pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
