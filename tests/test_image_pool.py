"""Disk-backed classification pools + Caltech-style multi-method driver
(reference load_winds NN.py:1479, run_AlexNet_AL NNAL.py:587-762)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nnal_tpu.cli.run_querying import filter_classes, run_classification_al
from nnal_tpu.data.image_pool import (
    ImagePathPool,
    InMemoryPool,
    LazyPoolView,
    load_winds,
    write_path_pool,
)


@pytest.fixture(scope="module")
def disk_pool(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths, labels = [], []
    for i in range(40):
        img = rng.integers(0, 255, size=(12, 10, 3), dtype=np.uint8)
        # make the two classes trivially separable by brightness
        lab = i % 2
        img = (img // 2 + lab * 120).astype(np.uint8)
        p = str(root / f"im{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        labels.append(lab)
    pfile, lfile = write_path_pool(str(root), paths, labels)
    return ImagePathPool(pfile, lfile, target_shape=(9, 9))


def test_load_winds_parity(disk_pool):
    x, labels = load_winds([0, 3, 7], disk_pool.imgs_path_file, (9, 9),
                           labels_file=disk_pool.labels_file)
    assert x.shape == (3, 9, 9, 3)
    assert labels == [0, 1, 1]
    xf, lf = disk_pool.fetch([0, 3, 7])
    np.testing.assert_allclose(xf, x)
    np.testing.assert_array_equal(lf, labels)


def test_lazy_pool_view(disk_pool):
    view = LazyPoolView(disk_pool, np.array([5, 1, 9]))
    assert view.shape == (3, 9, 9, 3)
    np.testing.assert_allclose(view[0:2], disk_pool.fetch([5, 1])[0])
    np.testing.assert_allclose(view[np.array([2])],
                               disk_pool.fetch([9])[0])


def test_filter_classes():
    labels = np.array([0, 3, 5, 3, 0, 7])
    keep, new = filter_classes(labels, [3, 7])
    np.testing.assert_array_equal(keep, [1, 3, 5])
    np.testing.assert_array_equal(new, [0, 0, 1])


def test_driver_disk_backed_campaign_with_resume(tmp_path, disk_pool):
    overrides = ("model_name=PW,k=2,B=10,ntb=16,b=8,epochs=1,"
                 "init_size=4,test_ratio=0.25,learning_rate=1e-3,seed=3")
    root = str(tmp_path / "caltech")
    res = run_classification_al(root, disk_pool, ["random", "entropy"], 4,
                                overrides)
    assert set(res) == {"random", "entropy"}
    for accs in res.values():
        assert len(np.atleast_1d(accs)) == 2
        assert np.all((np.atleast_1d(accs) >= 0)
                      & (np.atleast_1d(accs) <= 1))
    # second invocation: both methods complete -> skipped, same curves
    res2 = run_classification_al(root, disk_pool, ["random", "entropy"], 4,
                                 overrides)
    for m in res:
        np.testing.assert_allclose(np.atleast_1d(res2[m]),
                                   np.atleast_1d(res[m]))


def test_in_memory_pool_same_interface():
    X = np.zeros((6, 4, 4, 1), np.float32)
    pool = InMemoryPool(X, np.arange(6) % 2)
    assert len(pool) == 6
    assert pool.input_shape == (4, 4, 1)
    x, y = pool.fetch([1, 4])
    assert x.shape == (2, 4, 4, 1)
    np.testing.assert_array_equal(y, [1, 0])


def test_folder_class_paths(tmp_path):
    """prepare_data_4Alex parity (NNAL_tools.py:899-924): folder-per-class
    listing with deterministic class ids, feeding write_path_pool."""
    import os

    import numpy as np

    from nnal_tpu.data.image_pool import folder_class_paths, write_path_pool

    for c, names in (("cats", ["a.jpg", "b.jpg"]), ("dogs", ["c.jpg"])):
        os.makedirs(tmp_path / c)
        for n in names:
            (tmp_path / c / n).write_bytes(b"x")
    paths, labels = folder_class_paths(str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["a.jpg", "b.jpg", "c.jpg"]
    np.testing.assert_array_equal(labels, [0, 0, 1])
    # explicit folder order flips the class ids
    _, labels2 = folder_class_paths(str(tmp_path), folders=["dogs", "cats"])
    np.testing.assert_array_equal(labels2, [0, 1, 1])
    p, l = write_path_pool(str(tmp_path), paths, labels)
    assert open(p).read().splitlines() == paths
