"""Multi-subject experiment crash-resume: the (voxel, subject) query journal
and atomic state record restore membership and query counting."""

import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.multi_experiment import MultiImgExperiment

pytestmark = pytest.mark.slow


def test_multi_subject_resume(tmp_path):
    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "patch_shape": (9, 9, 1), "grid_spacing": 5,
        "k": 3, "B": 12, "ntb": 256, "b": 32, "epochs": 1,
        "learning_rate": 3e-4, "optimizer_name": "Adam"})
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]

    root = str(tmp_path / "resume")
    expr = MultiImgExperiment(root, cfg)
    expr.attach_subjects(subs)
    expr.prep_data()
    expr.add_method("entropy")
    r1 = expr.run_method("entropy", 3)
    assert r1["n_queries"] == 3

    # fresh object = process restart; budget extended
    expr2 = MultiImgExperiment(root)
    expr2.attach_subjects(subs)
    r2 = expr2.run_method("entropy", 6)
    assert r2["n_queries"] == 6
    # no overlap between resumed membership partitions
    assert len(np.intersect1d(r2["train_global"], r2["pool_global"])) == 0
    # first round's queries preserved in the journal
    import os

    qdir = os.path.join(root, "entropy", "queries")
    assert sorted(os.listdir(qdir)) == ["0.txt", "1.txt"]
