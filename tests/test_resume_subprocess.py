"""Cross-process replay determinism.

Round-1 verdict: ``RngStream.fold`` used Python's per-process-salted string
hash, so a crash-resumed campaign in a fresh interpreter queried with
different RNG than the original run — the journaled state was cosmetic.
These tests run campaigns in *subprocesses* (fresh interpreters, fresh hash
salts) and require bit-identical queries/metrics between an uninterrupted
run and an interrupt-then-resume run (reference resume mechanism,
PW_AL.py:722-734; SURVEY.md §5.2-5.3).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OVERRIDES = ("patch_shape=[9,9,1],grid_spacing=4,k=3,B=20,ntb=256,b=16,"
             "epochs=1,MC_iters=2,init_size=4,seed=7")

CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from nnal_tpu.cli.expr_handler import do_expr

root, method, nq, overrides = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
res = do_expr(root, method, nq, overrides, synthetic=True)
print("NQ", res["n_queries"])
"""


def _run_child(root, method, nq):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # fresh interpreter => fresh hash salt; do NOT set PYTHONHASHSEED —
    # replay must not depend on it
    env.pop("PYTHONHASHSEED", None)
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, root, method, str(nq), OVERRIDES],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc


def _campaign_artifacts(root, method):
    mdir = os.path.join(root, method)
    qdir = os.path.join(mdir, "queries")
    queries = {f: np.loadtxt(os.path.join(qdir, f))
               for f in sorted(os.listdir(qdir))}
    with open(os.path.join(mdir, "perf_evals.txt")) as f:
        evals = f.read()
    train = np.loadtxt(os.path.join(mdir, "curr_train_inds.txt"))
    return queries, evals, train


def test_interrupted_resume_bit_identical(tmp_path):
    method = "entropy"
    a = str(tmp_path / "uninterrupted")
    b = str(tmp_path / "resumed")

    # uninterrupted: 6 queries in one process
    _run_child(a, method, 6)
    # interrupted: 3 queries, process exits; fresh process resumes to 6
    _run_child(b, method, 3)
    _run_child(b, method, 6)

    qa, ea, ta = _campaign_artifacts(a, method)
    qb, eb, tb = _campaign_artifacts(b, method)
    assert list(qa) == list(qb)
    for f in qa:
        np.testing.assert_array_equal(qa[f], qb[f], err_msg=f"queries {f}")
    assert ea == eb, "per-round F-measures differ after resume"
    np.testing.assert_array_equal(ta, tb)


def test_fold_is_process_stable():
    # pin CPU *inside* the child: the baked sitecustomize resets
    # jax_platforms to "axon,cpu" at jax import, so the env var alone
    # would make this test hang whenever the TPU tunnel is unhealthy
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from nnal_tpu.core.rng import RngStream; "
            "print(RngStream(11).fold('query-entropy-3').seed)")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONHASHSEED", None)
    outs = []
    for _ in range(2):
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=REPO, capture_output=True, text=True,
                              timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        outs.append(proc.stdout.strip())
    assert outs[0] == outs[1], f"fold() is process-salted: {outs}"
