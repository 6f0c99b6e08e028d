"""Functional experiment front-end + CLI.

Rebuild of ``expr_handler.py`` (reference expr_handler.py:11-160):
``create_expr`` / ``create_run`` / ``do_expr`` and an argv main of the form

    python -m nnal_tpu.cli.expr_handler <root_dir> <method> <nqueries> \
        [key=val,key=val ...] [--synthetic]

The reference's template + ``key=val`` overrides (type-preserving) are kept
via :func:`nnal_tpu.core.config.set_parameters`.
"""

from __future__ import annotations

import os
import sys

from nnal_tpu.core.config import ExperimentConfig, set_parameters
from nnal_tpu.engine.pw_experiment import PWExperiment

# demo campaign protocol on the dense synthetic subject, shared by
# benchmarks/demo_learning_curves.py and examples/patchwise_al.py so the
# two can't drift.  epochs >= 15 at lr 1e-3: with tens of labels and b=64
# an epoch is 1-2 Adam steps, and shorter training can pin a method in
# its initial one-class regime (F=0 forever) — the campaign-protocol
# lesson documented in CLAUDE.md / benchmarks/campaigns.py
DEMO_CAMPAIGN_OVERRIDES = (
    "patch_shape=[11,11,1],grid_spacing=2,k=20,B=200,"
    "ntb=1024,b=64,epochs=15,init_size=40,seed=3,"
    "learning_rate=1e-3,optimizer_name=Adam,MC_iters=3,"
    "synthetic_shape=[40,40,12],synthetic_blobs=8")

DEFAULT_PARS = {
    "model_name": "PW",
    "patch_shape": [15, 15, 1],
    "grid_spacing": 3,
    "k": 10,
    "B": 100,
    "ntb": 1024,
    "b": 64,
    "epochs": 1,
    "MC_iters": 5,
    "learning_rate": 1e-3,
    "dropout_rate": 0.5,
    "optimizer_name": "Adam",
    "lambda_": 0.0,
    "init_size": 8,
    "seed": 0,
}


def create_expr(root_dir: str, overrides: str = "",
                synthetic: bool = False) -> PWExperiment:
    par_path = os.path.join(root_dir, "parameters.txt")
    if os.path.exists(par_path):
        expr = PWExperiment(root_dir)
    else:
        pars = set_parameters(DEFAULT_PARS, overrides)
        expr = PWExperiment(root_dir, ExperimentConfig.from_pars(pars))
    if synthetic:
        from nnal_tpu.data.io import synthetic_subject

        shape = tuple(getattr(expr.config, "synthetic_shape", (36, 36, 10)))
        blobs = int(getattr(expr.config, "synthetic_blobs", 3))
        vols, mask = synthetic_subject(shape=shape, n_modalities=2,
                                       n_blobs=blobs,
                                       seed=expr.config.seed)
        expr.attach_subject(vols, mask)
    if not os.path.exists(os.path.join(root_dir, "init_pool_inds.txt")):
        expr.prep_data()
    return expr


def do_expr(root_dir: str, method: str, nqueries: int,
            overrides: str = "", synthetic: bool = False) -> dict:
    """add_method-if-missing + run_method (reference ``do_expr``,
    expr_handler.py:11-28)."""
    expr = create_expr(root_dir, overrides, synthetic)
    method_dir = os.path.join(root_dir, method)
    if not os.path.exists(os.path.join(method_dir, "curr_weights.npz")):
        expr.add_method(method)
    return expr.run_method(method, nqueries)


def print_parameters(root_dir: str) -> None:
    """Pretty-print an experiment's parameters (reference
    ``print_parameters``, expr_handler.py:124-138)."""
    import yaml

    with open(os.path.join(root_dir, "parameters.txt")) as f:
        pars = yaml.safe_load(f)
    for key in sorted(pars):
        print(f"{key:>20}: {pars[key]}")


def create_run(root_dir: str, overrides: str = "",
               synthetic: bool = False):
    """Alias of :func:`create_expr` kept for reference front-end parity
    (expr_handler.py:43-89 — a 'run' is an experiment directory here)."""
    return create_expr(root_dir, overrides, synthetic)


def main(argv=None):
    from nnal_tpu.core.platform import honor_env_platforms

    honor_env_platforms()
    # process entry point: warm/persist XLA compiles across invocations
    # (remote TPU compiles are the dominant per-campaign one-time cost)
    from nnal_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = "--synthetic" in argv
    argv = [a for a in argv if a != "--synthetic"]
    if len(argv) < 3:
        print(__doc__)
        return 1
    root_dir, method, nqueries = argv[0], argv[1], int(argv[2])
    overrides = argv[3] if len(argv) > 3 else ""
    res = do_expr(root_dir, method, nqueries, overrides, synthetic)
    print(f"method={method} queries={res['n_queries']} "
          f"perf={res['perf'].tolist()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
