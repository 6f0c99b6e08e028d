import os

import numpy as np

from nnal_tpu.core.config import ExperimentConfig, set_parameters
from nnal_tpu.core.journal import MethodJournal
from nnal_tpu.core.rng import RngStream
from nnal_tpu.data.batching import (
    gen_batch_inds,
    gen_minibatch_labeled_unlabeled_inds,
    make_onehot,
)
from nnal_tpu.data.stats import StreamingMoments, multimg_stats, volume_stats


def test_config_roundtrip(tmp_path):
    cfg = ExperimentConfig.from_pars(
        {"k": 20, "patch_shape": [25, 25, 1], "learning_rate": 1e-2,
         "model_name": "PW", "MC_iters": 5})
    assert cfg.query.k == 20
    assert cfg.model.patch_shape == (25, 25, 1)
    p = str(tmp_path / "parameters.txt")
    cfg.to_yaml(p)
    cfg2 = ExperimentConfig.from_yaml(p)
    assert cfg2.query.k == 20
    assert tuple(cfg2.model.patch_shape) == (25, 25, 1)
    assert cfg2.query.MC_iters == 5


def test_set_parameters_coercion():
    pars = set_parameters({"k": 10, "learning_rate": 0.1, "model_name": "PW"},
                          "k=25,learning_rate=1e-3,model_name=VGG,extra=[1,2]")
    assert pars["k"] == 25 and isinstance(pars["k"], int)
    assert pars["learning_rate"] == 1e-3
    assert pars["model_name"] == "VGG"
    assert pars["extra"] == [1, 2]
    # tuple literals (YAML has none): reference-style patch_shape override
    pars = set_parameters({"patch_shape": (25, 25, 1)},
                          "patch_shape=(9,9,1),other=(1,2)")
    assert pars["patch_shape"] == (9, 9, 1)
    assert pars["other"] == (1, 2)


def test_rng_stream_replayable():
    import jax

    def raw(key):
        return np.asarray(jax.random.key_data(key))

    s1, s2 = RngStream(7), RngStream(7)
    assert np.allclose(raw(s1.next()), raw(s2.next()))
    state = s1.state()
    a = raw(s1.next())
    h = s1.host.integers(0, 100, 5)
    s1.restore(state)
    np.testing.assert_array_equal(raw(s1.next()), a)
    # host state resumes mid-stream too
    s2.restore(state)
    s2.next()
    np.testing.assert_array_equal(s2.host.integers(0, 100, 5), h)


def test_journal_replay(tmp_path):
    j = MethodJournal(str(tmp_path), "entropy")
    j.init_membership(train_inds=[1, 2], pool_inds=[3, 4, 5, 6])
    j.record_queries(0, [4, 6])
    j.record_queries(1, [3])
    assert j.n_queried() == 3
    np.testing.assert_array_equal(j.replay_queries(), [4, 6, 3])
    j.save_state(round_id=2, rng_state=RngStream(0).state(), n_train=5, n_pool=1)
    st = j.load_state()
    assert st["round"] == 2 and st["n_pool"] == 1
    j.append_eval([0.5, 0.25])
    evals = j.load_evals()
    np.testing.assert_allclose(evals, [0.5, 0.25])


def test_gen_batch_inds_partition(rng):
    batches = gen_batch_inds(103, 10, rng)
    assert len(batches) == 11
    assert all(len(b) == 10 for b in batches[:10])
    assert len(batches[-1]) == 3
    full = np.concatenate(batches[:10])
    assert len(np.unique(full)) == 100


def test_labeled_unlabeled_gen(rng):
    L = np.zeros(50)
    L[:10] = 1
    gen = gen_minibatch_labeled_unlabeled_inds(L, 8, rng, n_labeled=2)
    for _ in range(5):
        lab, unlab = next(gen)
        assert len(lab) == 2 and len(unlab) == 6
        assert (L[lab] == 1).all() and (L[unlab] == 0).all()


def test_onehot():
    oh = make_onehot([0, 2, 1], 3)
    np.testing.assert_array_equal(oh, np.eye(3)[[0, 2, 1]])


def test_stats():
    rng = np.random.default_rng(0)
    img = rng.normal(5, 2, size=(20, 20, 4))
    mask = np.zeros_like(img)
    mask[:5] = np.nan
    mu, sd = volume_stats(img, mask)
    sel = img[5:]
    assert np.isclose(mu, sel.mean()) and np.isclose(sd, sel.std())

    stats = multimg_stats([([img, img * 2], mask)])
    assert stats.shape == (1, 4)
    assert np.isclose(stats[0, 2], (img[5:] * 2).mean())


def test_streaming_moments():
    rng = np.random.default_rng(1)
    x = rng.normal(3, 4, size=10000)
    sm = StreamingMoments()
    for chunk in np.array_split(x, 7):
        sm.update(chunk)
    assert np.isclose(sm.mean, x.mean())
    assert np.isclose(sm.std, x.std(), rtol=1e-6)


def test_synthetic_dataset_files(tmp_path):
    from nnal_tpu.data.io import read_volume, write_synthetic_dataset

    reg = write_synthetic_dataset(str(tmp_path), n_subjects=2,
                                  shape=(16, 16, 6), n_modalities=2)
    assert len(reg.subjects) == 2
    vols, mask = reg.subjects[0].load()
    assert len(vols) == 2 and vols[0].shape == (16, 16, 6)
    assert set(np.unique(mask[~np.isnan(mask)])) <= {0.0, 1.0}
    assert read_volume(reg.subjects[0].modality_paths[0]).shape == (16, 16, 6)
