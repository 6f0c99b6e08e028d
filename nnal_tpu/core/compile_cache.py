"""Persistent XLA compilation cache wiring.

Remote (tunneled) TPU compiles are the dominant one-time cost of every
campaign here (~60-130 s; the PW1 fused scorer alone is minutes), so the
process entry points enable JAX's persistent compilation cache by
default.  Measured on the axon tunnel: a conv+grad program compiles in
3.5 s cold and loads in 0.5 s from a warm cache in a fresh process —
per-component cache-key hashes are stable across processes (an earlier
round recorded the opposite; that observation did not reproduce and is
superseded by this module's test and the committed warm-campaign rows).

Environment:
  NNAL_COMPILE_CACHE=<dir>          cache directory (default
                                    ~/.cache/nnal_tpu/xla)
  NNAL_COMPILE_CACHE=0 | off | none disable (all three spellings; ignored
                                    when the caller passes an explicit path)
  NNAL_COMPILE_CACHE=1 | on | true  enable at the default directory (these
                                    would otherwise create a literal ./1
                                    cache directory)
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "nnal_tpu",
                        "xla")


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (or the
    ``NNAL_COMPILE_CACHE`` env var, or the default user cache dir).

    Returns the directory in use, or None when disabled.  Safe to call
    any time before (or between) compiles; programs already compiled in
    this process are unaffected.  Uses JAX's default write thresholds
    (min compile time ~1 s), so only expensive programs are persisted.
    """
    import jax

    env = os.environ.get("NNAL_COMPILE_CACHE", "")
    # every disable spelling behaves identically, and only when the caller
    # did not pass an explicit path (an explicit argument always wins)
    if path is None and env.lower() in ("0", "off", "none"):
        return None
    # enable-spellings mean "default dir", not a directory literally
    # named "1"/"on"/"true"/"yes"
    if env.lower() in ("1", "on", "true", "yes"):
        env = ""
    path = path or (env if env else _DEFAULT)
    os.makedirs(path, exist_ok=True)
    changed = jax.config.jax_compilation_cache_dir != path
    jax.config.update("jax_compilation_cache_dir", path)
    if changed:
        # The cache object is created lazily on first compile and pins the
        # directory it saw then; re-pointing the config mid-process (e.g. a
        # test redirecting an already-warm process) needs an explicit reset
        # or reads/writes keep going to the old directory.
        from jax._src import compilation_cache as _cc
        if _cc.is_initialized():
            _cc.reset_cache()
    return path
