"""Optional TensorBoard mirror + Orbax checkpoint backend (round-1
deferred items, SURVEY.md §5.4-5.5)."""

import os

import jax
import numpy as np
import pytest

from nnal_tpu.core.tb import TBWriter
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_pw1


def test_tb_writer_noop_without_logdir():
    w = TBWriter(None)
    assert not w.active
    w.scalar("x", 1.0, 0)   # must not raise
    w.close()


def test_tb_writer_writes_events(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    d = str(tmp_path / "tb")
    w = TBWriter(d)
    assert w.active
    w.scalars({"al/f": 0.5, "al/n": 3}, 0)
    w.scalar("al/f", 0.7, 1)
    w.close()
    files = [f for root, _, fs in os.walk(d) for f in fs
             if "tfevents" in f]
    assert files, "no event files written"


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from nnal_tpu.models.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    spec = create_pw1(2, 0.2, (9, 9, 1))
    params, bn = init_cnn(spec, jax.random.key(0))
    p = str(tmp_path / "ckpt")
    save_checkpoint_orbax(p, params, bn_state=bn,
                          al_state={"step": 7})
    params2, bn2, teacher2, al2 = load_checkpoint_orbax(p)
    assert al2["step"] == 7
    assert teacher2 is None
    for layer in params:
        np.testing.assert_allclose(np.asarray(params[layer]["W"]),
                                   np.asarray(params2[layer]["W"]))
