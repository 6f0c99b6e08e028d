"""Checkpointing: one atomic record per save + reference-h5 import shim.

Rebuild of the reference's persistence (SURVEY.md §5.4): HDF5 layer-group
weights (NN.py:379-419, NN_extended.py:670-736), assign-op reload machinery
(obsolete under JAX — reload is just passing a new pytree), best-model
tracking, and per-iteration weight files.  A checkpoint here is a single
``.npz`` holding params, BN state, optional EMA-teacher params and the
AL-loop state, written atomically.  ``load_reference_h5`` imports the
reference's ``{layer}/{Weight,Bias}`` layout when h5py is available.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

# storage-dtype marker appended to npz keys holding bfloat16 payloads
# (numpy has no native bfloat16 descr; the bits are stored as uint16 and
# re-viewed through ml_dtypes at load time)
_BF16 = "@bf16"


@jax.jit
def _cast_tree_bf16(tree):
    """ONE whole-tree device cast f32 -> bf16 (halves the device->host
    checkpoint pull on tunneled backends, where bytes — not streams — are
    the transfer lever; CLAUDE.md transfer economics).  A single program:
    eager per-leaf ``astype`` would dispatch one remote compile per leaf
    shape, which ate the byte savings in short campaigns (same lesson as
    the multi engine's hist cast)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, tree)


@jax.jit
def round_trip_bf16(tree):
    """f32 -> bf16 -> f32 rounding of every float32 leaf, one program.

    The bf16-anchor scheme's bit-identity trick: at anchor rounds the
    engine ADOPTS these rounded values into its live state before saving,
    so the bf16 checkpoint on disk decodes to exactly the values the
    uninterrupted process keeps training with — crash-resume stays
    bit-identical by construction (resume == continue).  bf16 keeps f32's
    exponent range, so tiny Adam second moments (~1e-8) survive the
    round-trip (float16 would flush them)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
        if a.dtype == jnp.float32 else a, tree)


# int8 anchor codec: per-last-axis-slice symmetric quantization of the
# weight matrices (s = max|x|/127 over all axes but the last — the
# out-channel/out-feature axis for conv and fc alike), biases/bn/opt in
# bf16.  4x fewer pull bytes than bf16 on the params payload.  The same
# bit-identity scheme as bf16 anchors: the engine ADOPTS the dequantized
# values (``round_trip_int8``) at every full save, and the decode is the
# identical IEEE f32 multiply on host, so disk == live exactly.
_I8 = "@i8"
_I8S = "@i8s"


def _i8_parts(x):
    s = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)),
                keepdims=True) / 127.0
    safe = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _i8_eligible(x) -> bool:
    return (hasattr(x, "ndim") and x.ndim >= 2
            and getattr(x, "dtype", None) == jnp.float32)


@jax.jit
def _encode_tree_i8(tree):
    """ONE device program: every eligible leaf -> (q, s) pair; the rest
    pass through for the bf16 path."""
    return jax.tree_util.tree_map(
        lambda x: _i8_parts(x) if _i8_eligible(x) else x, tree)


@jax.jit
def round_trip_int8(tree):
    """Quantize-dequantize every weight matrix (int8 per-out-slice) and
    bf16-round everything else float32 — the int8 anchor's adoption step
    (see ``round_trip_bf16`` for why adoption makes resume bit-identical)."""
    def rt(x):
        if _i8_eligible(x):
            q, s = _i8_parts(x)
            return q.astype(jnp.float32) * s
        if getattr(x, "dtype", None) == jnp.float32:
            return x.astype(jnp.bfloat16).astype(jnp.float32)
        return x
    return jax.tree_util.tree_map(rt, tree)


def _encode_payload_int8(payload: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pre-pull int8 encoding of the params/teacher groups (weights ->
    q + scale under marked keys); everything else takes the bf16 path.
    Optimizer moments stay bf16 — int8 second moments would span too few
    decades (the engines pair int8 anchors with opt_reset_per_round
    anyway, where no moments are saved at all).  Host (numpy) leaves use
    the same IEEE f32 formula, so device and host encodes agree bitwise."""
    def _is_w(k, v):
        return ((k.startswith("params/") or k.startswith("teacher/"))
                and getattr(v, "ndim", 0) >= 2
                and np.dtype(getattr(v, "dtype", None)) == np.float32)

    dev_group = {k: v for k, v in payload.items()
                 if _is_w(k, v) and isinstance(v, jax.Array)}
    host_group = {k: v for k, v in payload.items()
                  if _is_w(k, v) and not isinstance(v, jax.Array)}
    enc = dict(_encode_tree_i8(dev_group)) if dev_group else {}
    for k, v in host_group.items():
        s = (np.max(np.abs(v), axis=tuple(range(v.ndim - 1)),
                    keepdims=True) / np.float32(127.0)).astype(np.float32)
        safe = np.where(s > 0, s, np.float32(1.0))
        q = np.clip(np.round(v / safe), -127, 127).astype(np.int8)
        enc[k] = (q, s)
    rest = _encode_payload_bf16(
        {k: v for k, v in payload.items() if k not in enc})
    out = dict(rest)
    for k, (q, s) in enc.items():
        out[k + _I8] = q
        out[k + _I8S] = s
    return out


def _encode_payload_bf16(payload: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pre-pull encoding: float32 leaves -> bf16 (device leaves via ONE
    jitted tree cast; host leaves via ml_dtypes).  Leaves already bf16
    pass through.  Non-float leaves (ints, the al_state bytes) untouched."""
    dev = {k: v for k, v in payload.items()
           if isinstance(v, jax.Array) and v.dtype == jnp.float32}
    if dev:
        dev = _cast_tree_bf16(dev)
    out = {}
    for k, v in payload.items():
        if k in dev:
            out[k] = dev[k]
        elif isinstance(v, np.ndarray) and v.dtype == np.float32:
            out[k] = v.astype(ml_dtypes.bfloat16)
        else:
            out[k] = v
    return out


def _mark_and_view(payload: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Post-pull: bf16 host arrays -> uint16 bit views under a marked key
    (npz stays pure-numpy portable)."""
    out = {}
    for k, v in payload.items():
        a = np.asarray(v)
        if a.dtype == ml_dtypes.bfloat16:
            out[k + _BF16] = a.view(np.uint16)
        else:
            out[k] = a
    return out


def _decode_flat(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Load-side inverse of ``_mark_and_view``/int8 encoding: marked
    arrays come back as float32.  Exactly the adopted values — bf16
    entries are exact representables, and the int8 decode is the same
    IEEE f32 multiply the device adoption performed."""
    out = {}
    scales = {k[:-len(_I8S)]: v for k, v in flat.items()
              if k.endswith(_I8S)}
    for k, v in flat.items():
        if k.endswith(_I8S):
            continue
        if k.endswith(_I8):
            base = k[:-len(_I8)]
            out[base] = v.astype(np.float32) * scales[base]
        elif k.endswith(_BF16):
            out[k[:-len(_BF16)]] = (
                v.view(ml_dtypes.bfloat16).astype(np.float32))
        else:
            out[k] = v
    return out


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = v   # device arrays pulled in one batch at save time
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _chunked_device_get(tree):
    """Parallel device->host pull of any pytree: per-leaf fetches run on
    a thread pool so each array rides its own RPC stream on tunneled
    remote backends (measured ~2x the single-stream bandwidth).  Pure
    data movement — no device programs, so nothing to compile (an
    earlier variant that sliced leaves into device-side chunks compiled
    one tiny program per slice offset on the remote compiler and lost
    far more than it gained)."""
    import concurrent.futures as cf

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    for v in leaves:
        if isinstance(v, jax.Array):
            # start all DMAs before any blocking fetch
            v.copy_to_host_async()
    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        pulled = list(ex.map(np.asarray, leaves))
    return jax.tree_util.tree_unflatten(treedef, pulled)


class AsyncCheckpointWriter:
    """Overlap checkpoint device->host pulls and disk writes with
    subsequent device work (the async-checkpoint pattern of production
    training systems, scoped to the npz format).

    ``submit(fn)`` runs ``fn`` (typically: pull state + one or more
    ``save_checkpoint`` calls) on a background thread after waiting for
    any previous submission.  Callers MUST ``wait()`` before any step
    that donates the checkpointed buffers (the engines wait at the top
    of the next finetune), and at the end of the run.  A crash while a
    save is in flight loses at most that one round's checkpoint, which
    the engines' replayable query journals already recover from
    (SURVEY.md §5.3: resume = last checkpoint + deterministic replay)."""

    def __init__(self):
        self._thread = None
        self._error = None

    def submit(self, fn) -> None:
        import threading

        self.wait()

        def _run():
            try:
                fn()
            except BaseException as e:   # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def save_checkpoint(path: str, params: Dict, *, bn_state: Optional[Dict] = None,
                    teacher_params: Optional[Dict] = None,
                    al_state: Optional[dict] = None,
                    opt_state=None, dtype: Optional[str] = None) -> None:
    """Atomic single-file checkpoint (tmpfile + rename), so an interrupted
    save never corrupts the resume point (SURVEY.md §5.3).

    ``opt_state`` may be any optax state pytree; its leaves are stored
    positionally (``opt/<i>``) and re-attached at load time to a freshly
    ``tx.init``-ed state of the same structure, so a resumed finetune
    continues with identical Adam moments (bit-identical replay).

    ``dtype='bfloat16'`` stores float32 leaves as bf16 (uint16 bit views
    under ``@bf16``-marked keys) and casts DEVICE leaves before the pull,
    halving the dominant tunnel transfer.  Loaders transparently decode
    back to float32.  For bit-identical crash-resume the engines pair this
    with ``round_trip_bf16`` adoption (see its docstring); leaves that are
    already bf16 (pre-cast by a caller sharing one pull) pass through."""
    payload = {}
    payload.update(_flatten(params, "params/"))
    if bn_state:
        payload.update(_flatten(bn_state, "bn/"))
    if teacher_params:
        payload.update(_flatten(teacher_params, "teacher/"))
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            payload[f"opt/{i:04d}"] = leaf
    if al_state is not None:
        payload["__al_state__"] = np.frombuffer(
            json.dumps(al_state).encode(), dtype=np.uint8)
    if dtype == "bfloat16":
        payload = _encode_payload_bf16(payload)
    elif dtype == "int8":
        payload = _encode_payload_int8(payload)
    elif dtype not in (None, "float32"):
        raise ValueError(f"unsupported checkpoint dtype {dtype!r}")
    payload = _mark_and_view(_chunked_device_get(payload))
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    os.close(fd)
    try:
        np.savez(tmp, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str):
    """Returns (params, bn_state, teacher_params, al_state).  bf16-stored
    leaves (``@bf16`` keys) decode to float32 transparently."""
    with np.load(path, allow_pickle=False) as z:
        flat = _decode_flat({k: z[k] for k in z.files})
    al_state = None
    if "__al_state__" in flat:
        al_state = json.loads(flat.pop("__al_state__").tobytes().decode())
    groups = {"params": {}, "bn": {}, "teacher": {}}
    for k, v in flat.items():
        head, _, rest = k.partition("/")
        groups.setdefault(head, {})[rest] = v
    params = _unflatten(groups["params"])
    bn = _unflatten(groups["bn"]) if groups["bn"] else None
    teacher = _unflatten(groups["teacher"]) if groups["teacher"] else None
    return params, bn, teacher, al_state


def save_checkpoint_orbax(path: str, params: Dict, *,
                          bn_state: Optional[Dict] = None,
                          teacher_params: Optional[Dict] = None,
                          al_state: Optional[dict] = None) -> None:
    """Orbax-backed checkpoint option (one directory per checkpoint):
    same logical record as the npz format, for users standardized on
    orbax tooling.  The npz path remains the default (single file,
    h5-shim interop)."""
    import orbax.checkpoint as ocp

    record = {"params": params}
    if bn_state:
        record["bn"] = bn_state
    if teacher_params:
        record["teacher"] = teacher_params
    if al_state is not None:
        record["al_state"] = al_state
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), record, force=True)


def load_checkpoint_orbax(path: str):
    """Returns (params, bn_state, teacher_params, al_state) — the npz
    loader's contract."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    record = ckptr.restore(os.path.abspath(path))
    return (record.get("params"), record.get("bn"),
            record.get("teacher"), record.get("al_state"))


def restore_opt_state(path: str, opt_state):
    """Re-attach checkpointed optimizer-state leaves (``opt/<i>`` entries)
    onto a freshly initialized state of identical structure.  Returns the
    input unchanged when the checkpoint predates opt-state saving."""
    with np.load(path, allow_pickle=False) as z:
        flat = _decode_flat({k: z[k] for k in z.files
                             if k.startswith("opt/")})
        keys = sorted(flat)
        if not keys:
            return opt_state
        saved = [flat[k] for k in keys]
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    if len(saved) != len(leaves):
        raise ValueError(f"checkpoint has {len(saved)} opt leaves, "
                         f"state needs {len(leaves)}")
    new = [np.asarray(s, dtype=np.asarray(l).dtype).reshape(np.shape(l))
           for s, l in zip(saved, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def load_reference_h5(path: str, params_template: Dict) -> Dict:
    """Import weights from the reference's HDF5 layout — one group per layer
    with ``Weight``/``Bias`` datasets (NN.py:379-419).  Shapes are matched
    against ``params_template``; FC weights are transposed if stored
    feature-major.  Requires h5py."""
    import h5py

    out = jax.tree_util.tree_map(np.asarray, params_template)
    with h5py.File(path, "r") as f:
        for layer in f:
            if layer not in out:
                continue
            grp = f[layer]
            if "Weight" in grp:
                w = np.asarray(grp["Weight"])
                want = out[layer]["W"].shape
                if w.shape != want and w.T.shape == want:
                    w = w.T
                if w.shape != want:
                    raise ValueError(
                        f"{layer}/Weight shape {w.shape} vs {want}")
                out[layer]["W"] = w
            if "Bias" in grp:
                out[layer]["b"] = np.asarray(grp["Bias"]).reshape(
                    out[layer]["b"].shape)
    return out


def save_reference_h5(path: str, params: Dict) -> None:
    """Export to the reference's h5 layout for cross-framework comparison."""
    import h5py

    with h5py.File(path, "w") as f:
        for layer, vals in params.items():
            grp = f.create_group(layer)
            if "W" in vals:
                grp["Weight"] = np.asarray(vals["W"])
            if "b" in vals:
                grp["Bias"] = np.asarray(vals["b"])
