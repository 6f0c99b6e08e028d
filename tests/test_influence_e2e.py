"""Influence-function AL round + Dice eval (driver config #4)."""

import numpy as np
import pytest

from nnal_tpu.cli.expr_handler import do_expr
from nnal_tpu.evaluation.metrics import dice

pytestmark = pytest.mark.slow


def test_influence_al_round(tmp_path):
    overrides = ("patch_shape=[9,9,1],grid_spacing=5,k=4,B=16,ntb=256,"
                 "b=32,epochs=1,init_size=8,learning_rate=3e-4,"
                 "optimizer_name=Adam")
    res = do_expr(str(tmp_path / "ifl"), "influence", 4, overrides,
                  synthetic=True)
    assert res["n_queries"] == 4
    assert np.isfinite(res["perf"]).all()


def test_dice_alias():
    a = np.array([1, 1, 0, 0])
    b = np.array([1, 0, 1, 0])
    assert dice(a, b) == 0.5
