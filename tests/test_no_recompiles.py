"""Regression guard: AL rounds must not recompile.

Round-2 finding: per-round XLA recompiles (shrinking pool, growing
labeled set, per-call jitted closures) were ~98% of steady-state round
latency on the remote TPU compiler (entropy 9.3->0.18 s/round once
fixed).  These tests pin the property: continuing a warm campaign
compiles (almost) nothing new.
"""

import logging

import numpy as np
import pytest

from nnal_tpu.cli.expr_handler import do_expr


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        if "Compiling" in record.getMessage():
            self.count += 1


@pytest.fixture
def compile_counter():
    import jax

    jax.config.update("jax_log_compiles", True)
    h = _CompileCounter()
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(h)
    yield h
    logger.removeHandler(h)
    jax.config.update("jax_log_compiles", False)


OVERRIDES = ("patch_shape=[9,9,1],grid_spacing=4,k=3,B=20,ntb=256,b=16,"
             "epochs=1,MC_iters=2,init_size=6,seed=19")


@pytest.mark.parametrize("method", ["entropy", "influence"])
def test_warm_campaign_rounds_compile_nothing(tmp_path, compile_counter,
                                              method):
    root = str(tmp_path / method)
    # warm campaign: 2 rounds pay all compiles
    do_expr(root, method, 6, OVERRIDES, synthetic=True)
    warm = compile_counter.count
    assert warm > 0
    # 2 more rounds in the same process: pool shrank by 6, labeled set
    # grew by 6 — bucketing must keep every program cached
    do_expr(root, method, 12, OVERRIDES, synthetic=True)
    new = compile_counter.count - warm
    assert new <= 2, (f"{new} programs compiled during warm {method} "
                      f"rounds — shape bucketing regressed")
