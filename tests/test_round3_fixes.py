"""Round-3 fixes: decoded-image / eval-sample RAM cache semantics.

The cache (TPU.DECODE_CACHE_MB) must be a pure speed knob: train batches
bit-identical with it on or off (augmentation RNG untouched), eval samples
served from cache identical to freshly-computed ones, and a tiny budget
degrades to correct uncached behavior.
"""

import numpy as np
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.data import dataset_meta, make_synthetic_db
from fhpe_tpu.data.loader import BatchLoader, PoseDataSource


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d = tmp_path_factory.mktemp("cache_db")
    return make_synthetic_db(str(d), 16, 16, (96, 96))


def _cfg(cache_mb):
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.TPU.DECODE_CACHE_MB = cache_mb
    return cfg


def _epoch_batches(db, cache_mb, is_train, epochs=2, seed=3):
    meta = dataset_meta("mpii")
    src = PoseDataSource(_cfg(cache_mb), db, is_train=is_train,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"], seed=seed)
    loader = BatchLoader(src, batch_size=8, shuffle=is_train,
                         drop_last=is_train, host_targets=True,
                         num_threads=2, seed=seed)
    return [list(loader) for _ in range(epochs)], src


@pytest.mark.parametrize("cache_mb", [1024, 1])  # ample and starved budgets
def test_train_batches_bit_identical_with_cache(db, cache_mb):
    (ep_nc, _), _ = _epoch_batches(db, 0, is_train=True)
    (ep_c, _), src = _epoch_batches(db, cache_mb, is_train=True)
    for a, b in zip(ep_nc, ep_c):
        for k in a:
            if k == "image_path":
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(a[k], b[k])


def test_eval_sample_cache_hits_and_matches(db):
    (e1_nc, e2_nc), _ = _epoch_batches(db, 0, is_train=False)
    (e1_c, e2_c), src = _epoch_batches(db, 1024, is_train=False)
    assert len(src._sample_cache) == len(db)  # epoch 1 populated it
    for a, b in zip(e1_nc + e2_nc, e1_c + e2_c):
        for k in a:
            if k == "image_path":
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(a[k], b[k])


def test_cached_arrays_are_write_protected(db):
    meta = dataset_meta("mpii")
    src = PoseDataSource(_cfg(1024), db, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    src.get_sample(0)
    img = src._img_cache[db[0]["image"]]
    with pytest.raises(ValueError):
        img[0, 0, 0] = 0
