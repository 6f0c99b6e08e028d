"""Typed configuration tree.

The reference keeps one flat YAML dict (``expr.pars``) whose observed key set is
documented in SURVEY.md §5.6 (reference: AL.py:87-109, PW_AL.py:91-113,
expr_handler.py:91-122).  Here the same keys live in a typed dataclass tree,
serialized to YAML with the *same key names* so experiment directories stay
interoperable.  ``ExperimentConfig.pars`` exposes the flat dict view.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import yaml


@dataclass
class DataConfig:
    """Data/pool definition (reference pars: img_paths, mask_path, stats,
    grid_spacing, target_shape, mean, data, pool_paths, indiv_img_ind)."""

    img_paths: list = field(default_factory=list)       # per-modality image paths
    mask_path: Optional[str] = None
    pool_paths: list = field(default_factory=list)      # multi-subject pools
    labeled_paths: list = field(default_factory=list)
    grid_spacing: int = 4
    target_shape: Optional[Sequence[int]] = None
    stats: Optional[Any] = None                          # [[mu, sigma], ...] per modality
    data: Optional[str] = None                           # dataset name tag
    indiv_img_ind: Optional[int] = None


@dataclass
class ModelConfig:
    """Model/train definition (reference pars: model_name, patch_shape,
    learning_rate, dropout_rate, optimizer_name, epochs, b, batch_size,
    train_layers, grad_layers, init_weights_path, pre_weights_path)."""

    model_name: str = "PW"
    nclass: int = 2
    patch_shape: tuple = (25, 25, 1)
    learning_rate: float = 1e-3
    dropout_rate: float = 0.5
    optimizer_name: str = "SGD"
    epochs: int = 1
    b: int = 128                      # train batch size (reference: pars['b'])
    batch_size: int = 128
    train_layers: list = field(default_factory=list)
    grad_layers: list = field(default_factory=list)
    init_weights_path: Optional[str] = None
    pre_weights_path: Optional[str] = None
    # extra factory kwargs for the model builder (e.g. Tiramisu
    # growth/depths for the dense-model AL path:
    # model_kwargs: {growth: 8, depths: [2, 2, 3]})
    model_kwargs: dict = field(default_factory=dict)
    # 'auto' weights CE by inverse class frequency of the labeled set
    # (reference bin_class_weights hyper, NN_extended.py:24-63)
    class_weights: Optional[Any] = "auto"
    dtype: str = "float32"            # compute dtype for the forward pass
    param_dtype: str = "float32"
    # mixed-precision training: 'bfloat16' runs the finetune/train steps
    # with bf16 activations + weights on the MXU while master params and
    # optimizer state stay f32 (TPU-native addition; the reference's TF1
    # training is f32-only)
    train_dtype: str = "float32"
    # aleatoric (AU_4L) head: doubles the last layer into [logits, log-sigma]
    # and trains the heteroscedastic logit-noise CE (reference AU hypers,
    # NN_extended.py:24-63,1520-1562)
    aleatoric: bool = False
    mc_t: int = 10
    # learning-without-forgetting: distill against the previous round's
    # model at temperature lwf_T with coefficient lwf_lambda (reference
    # ``get_LwF``, model_utils.py:98-135)
    lwf_lambda: float = 0.0
    lwf_T: float = 2.0
    # mean-teacher semi-supervised learning (reference MT_SSL,
    # NN_extended.py:1337-1396: EMA teacher via custom_getter +
    # consistency loss + sigmoid ramp-up).  consistency_coeff > 0 turns it
    # on end-to-end: the engines maintain an EMA teacher across AL rounds
    # (checkpointed in the anchors' teacher/ group), and every finetune
    # step adds coeff * consistency(student(x_u, dropout), teacher(x_u))
    # over unlabeled_batch pool patches — the semi-supervised signal the
    # unlabeled pool provides for free. consistency_ramp is the sigmoid
    # ramp-up length in optimizer steps (0 = constant coefficient).
    consistency_coeff: float = 0.0
    consistency_measure: str = "CE"     # CE | MSE
    consistency_ramp: int = 0
    ema_decay: float = 0.99
    # unlabeled patches per MT consistency step (0 = use the labeled
    # batch size b); sampled with replacement from the INITIAL pool so
    # crash-resume replay sees the identical stream (the current pool
    # differs between an original round and its replay)
    unlabeled_batch: int = 0
    # consistency ramp-DOWN as labels accumulate (reference rampdown
    # family, NN_extended.py:1462-1502, re-keyed from epochs to the AL
    # quantity that matters: labeled-set size).  With off_labels = L > 0
    # the coefficient keeps full strength below L/2 labels (the
    # low-budget regime where MT's boost lives), decays as
    # exp(-12.5 phase^2) over the second half, and switches fully off at
    # n_labeled >= L — without the ramp-down the consistency term
    # anchors the student to the teacher at the end of the curve (r04
    # low8: MT 0.901 final vs plain 0.946 — a crossover, not
    # convergence).  Depends only on n_labeled, so crash-resume replay
    # is bit-identical (engine.common.mt_rampdown).
    consistency_off_labels: int = 0
    # delay the consistency term until the labeled set reaches this size
    # (0 = from the start).  Measured rationale (CAMPAIGNS_r05 n=5 low8):
    # MT's only statistically-real effect was a ROUND-0 dip — consistency
    # against a freshly-copied teacher at the seed budget anchors the
    # first finetune (F 0.704 +- 0.068 vs plain 0.824 +- 0.037).
    consistency_start_labels: int = 0
    # overlap per-round checkpoint writes with the next round's scoring
    # (the async-checkpoint pattern of production training systems).
    # Off by default: on a direct-attached TPU the save is ~0.1 s so
    # there is nothing to hide, and on the tunneled dev chip the
    # background pull contends with scoring dispatches and makes BOTH
    # slower (measured: select 4.7 s -> 24-53 s/round)
    async_checkpoint: bool = False
    # write the FULL resume checkpoint (params + Adam moments, the ~0.5 GB
    # device pull) only every K rounds; intermediate rounds skip it (the
    # multi-subject engine still writes its params-only per-iter history
    # copy). Crash-resume stays bit-identical: queries are journaled and
    # the finetune RNG is keyed on the optimizer step, so resume replays
    # the skipped rounds' finetunes from the last anchor (~1.4 s/round on
    # chip vs ~21 s/round of checkpoint pull on the tunnel). 1 = every
    # round (reference semantics). A completed run_method always ends
    # with a full save, so only crashes ever replay.
    ckpt_full_every: int = 1
    # dtype for the multi-subject engine's per-iteration history
    # checkpoints (curr_weights_<i>.npz — analysis-only artifacts, the
    # reference's curr_weights_%d.h5). "float16" halves the per-round
    # device->host pull, the dominant cost on tunneled deployments
    # (CLAUDE.md: bytes, not streams, are the lever). Resume points
    # (anchors, curr_weights.npz) always stay full precision.
    hist_dtype: str = "float32"
    # write the per-iteration history checkpoint only every K rounds
    # (0 = never). 1 = reference semantics (curr_weights_%d.h5 each
    # iteration, PW_AL.py:895-898). With ckpt_full_every > 1 this is the
    # only device->host pull left on non-anchor rounds, so hist_every=0
    # makes those rounds transfer ZERO checkpoint bytes over the tunnel;
    # resume durability is unaffected (queries are journaled, replay runs
    # from the last anchor). Trade-off: per-iteration analysis artifacts
    # (engine/analysis.test_scores_matrix) need the history files.
    hist_every: int = 1
    # storage dtype for the RESUME checkpoints (anchors + the final full
    # save): "bfloat16" halves the params(+moments) device->host pull —
    # the #1 wall-clock item in tunneled campaigns (bytes are the lever) —
    # and "int8" cuts the weight matrices 4x further (per-out-slice
    # symmetric quantization, biases/bn/moments bf16).
    # Crash-resume stays bit-identical because at every full save the
    # engine ADOPTS the rounded/dequantized values into its live state
    # first (models.checkpoint.round_trip_bf16/round_trip_int8), so disk
    # decodes to exactly what the uninterrupted process keeps training
    # with. bf16 keeps f32's exponent range, so ~1e-8 Adam second moments
    # survive (float16 would flush them). Precision: bf16 rounding is
    # ~1e-3 relative on weights (same class as train_dtype=bfloat16);
    # int8 is ~0.4% relative per weight — adopted only at anchor rounds,
    # and the campaign F-curves are the measured quality evidence
    # (benchmarks/CAMPAIGNS_r04.json fi rows).
    ckpt_dtype: str = "float32"
    # warm-restart optimization: start each AL round's finetune from a
    # FRESH optimizer state instead of carrying Adam moments across
    # rounds. Resume anchors then skip the moment leaves entirely (2/3 of
    # the checkpoint payload) and crash-resume replay re-inits moments
    # identically — bit-identical by construction. The reference's TF1
    # AdamOptimizer slots persisted across finetunes (carry semantics =
    # default False); per-round restarts are a standard AL protocol and
    # their quality effect is measured in the campaign artifacts.
    opt_reset_per_round: bool = False
    # input perturbation for AU_4U output-perturbation uncertainty
    # (reference Gaussian_noise_std / rotation_angle, NN_extended.py:913)
    gaussian_noise_std: Optional[float] = 0.05
    rotation_angle: Optional[float] = None
    output_perturbation_measure: str = "CE"


@dataclass
class QueryConfig:
    """Query-strategy knobs (reference pars: k, B, ntb, MC_iters, lambda_,
    SDP_solver, iter_k, init_size, test_ratio)."""

    k: int = 10                       # queries per AL iteration
    B: int = 200                      # uncertainty-filter size
    ntb: int = 4096                   # eval (pool-scoring) batch size
    MC_iters: int = 10
    lambda_: float = 0.0
    SDP_solver: str = "device"        # 'device' (jitted A-optimal) | 'scipy'
    iter_k: Optional[list] = None     # per-iteration k schedule
    init_size: int = 0
    test_ratio: float = 0.2
    shrink_method: str = "sum"
    # diagonal loading of the conditional-FI A-matrices (reference
    # ``gen_A_matrices``'s load term, PW_NNAL.py:784-816) — one knob for
    # BOTH the single-subject and multi-subject fi paths, so identical
    # candidates produce identical A-matrices (and rankings) on either
    diag_load: float = 1e-5
    # ensemble/QBC-JS committee (reference PW_AL.py:780-845: 7 pretrained
    # weight files at round 0, re-finetuned copies afterwards; the size and
    # paths were hard-coded there, config keys here)
    n_ensemble: int = 5
    pretrained_paths: list = field(default_factory=list)
    # core-set labeled bootstrap grid spacing over held-out subjects
    # (reference gen_multimg_inds(labeled_paths, 50), PW_AL.py:809-822)
    bootstrap_spacing: int = 50
    # influence s_test solver: 'cg' (device Newton-CG, the reference's
    # exact semantics, Influence.py:445) or 'arnoldi' (low-rank Lanczos
    # eigenbasis approximation, Schioppa et al. arXiv:2112.03052 —
    # arnoldi_rank top eigenpairs; basis memory is rank x #params)
    influence_mode: str = "cg"
    arnoldi_rank: int = 8
    # shard the PATCH-WISE engines' grid-pool scoring over a
    # data_parallel-device mesh (entropy/MC/BALD/fi/AU_4U/committee sweeps
    # + device-resident feature flows run via
    # parallel.grid_sharded.ShardedGridPoolEvaluator; selections are
    # bit-identical to single-device). 1 = single device (default).
    # The classification engine's image pools ignore this key (it warns).
    data_parallel: int = 1


@dataclass
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    query: QueryConfig = field(default_factory=QueryConfig)
    seed: int = 0

    # ------------------------------------------------------------------ #
    # flat ``pars`` view for parity with the reference's expr.pars dict
    # ------------------------------------------------------------------ #
    @property
    def pars(self) -> dict:
        flat: dict = {"seed": self.seed}
        for section in (self.data, self.model, self.query):
            flat.update(dataclasses.asdict(section))
        return flat

    @classmethod
    def from_pars(cls, pars: dict) -> "ExperimentConfig":
        """Build a config tree from a flat reference-style dict."""
        cfg = cls()
        for key, val in pars.items():
            if key == "seed":
                cfg.seed = int(val)
                continue
            placed = False
            for section in (cfg.data, cfg.model, cfg.query):
                if key in {f.name for f in dataclasses.fields(type(section))}:
                    setattr(section, key, val)
                    placed = True
                    break
            if not placed:
                # unknown keys are preserved on the experiment for forward-compat
                setattr(cfg, key, val)
        if isinstance(cfg.model.patch_shape, list):
            cfg.model.patch_shape = tuple(cfg.model.patch_shape)
        return cfg

    # ------------------------------------------------------------------ #
    # YAML round trip (reference stores YAML in `parameters.txt`)
    # ------------------------------------------------------------------ #
    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(_clean(self.pars), f)

    @classmethod
    def from_yaml(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            pars = yaml.safe_load(f)
        return cls.from_pars(pars or {})


def _clean(obj):
    """Make a pars dict YAML-serializable (tuples -> lists, numpy -> python)."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: _clean(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_clean(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def set_parameters(template: dict, overrides: str) -> dict:
    """Reference-parity CLI override parser (expr_handler.py:91-122):
    ``"key1=val1,key2=val2"`` with type-preserving coercion against the
    template's value types."""
    pars = dict(template)
    if not overrides:
        return pars
    # split on top-level commas only, so list-valued overrides like
    # "extra=[1,2]" survive
    items, depth, cur = [], 0, []
    for ch in overrides:
        if ch in "[{(":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    for item in items:
        if not item.strip():
            continue
        key, _, raw = item.partition("=")
        key = key.strip()
        raw = raw.strip()

        def _load(s):
            # YAML has no tuple literal: accept "(9,9,1)" as a tuple so
            # reference-style overrides like patch_shape=(25,25,1) work
            if s.startswith("(") and s.endswith(")"):
                return tuple(yaml.safe_load("[" + s[1:-1] + "]"))
            return yaml.safe_load(s)

        if key in pars and pars[key] is not None:
            t = type(pars[key])
            if t is bool:
                pars[key] = raw.lower() in ("1", "true", "yes")
            elif t in (int, float, str):
                pars[key] = t(raw)
            else:
                pars[key] = _load(raw)
        else:
            pars[key] = _load(raw)
    return pars
