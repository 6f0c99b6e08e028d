"""Backend selection that honors an explicit ``JAX_PLATFORMS``.

This box's baked sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at ``import jax``, so
the standard env-var spelling ``JAX_PLATFORMS=cpu python script.py``
silently still targets (and, during a tunnel outage, hangs on) the
remote TPU.  Every process entry point (bench/campaign/CLI scripts)
calls :func:`honor_env_platforms` right after importing jax so the env
var means what users expect.  A no-op when the var is unset — the
sitecustomize default (TPU with CPU fallback) stays in charge.
"""

from __future__ import annotations

import os


def honor_env_platforms() -> str | None:
    """Re-apply ``JAX_PLATFORMS`` over any sitecustomize override.

    Returns the platform string applied, or None when the env var is
    unset/empty.  Must run before the backend initializes (first device
    op); safe to call multiple times.
    """
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plat:
        return None
    import jax

    jax.config.update("jax_platforms", plat)
    return plat
