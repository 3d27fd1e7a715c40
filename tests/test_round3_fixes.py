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


def test_cache_budget_is_process_global_and_released(db):
    """DECODE_CACHE_MB bounds the TOTAL cached bytes across all sources
    in the process (train + val together), and a source's reservations
    return to the pool when it is garbage-collected."""
    import gc

    from fhpe_tpu.data import loader as ld

    meta = dataset_meta("mpii")
    gc.collect()  # retire finalizers of earlier tests' sources
    base = ld._cache_used[0]

    def mk():
        return PoseDataSource(_cfg(1024), db, is_train=True,
                              flip_pairs=meta["flip_pairs"],
                              upper_body_ids=meta["upper_body_ids"])

    a, b = mk(), mk()
    a.get_sample(0)
    b.get_sample(0)
    used = ld._cache_used[0] - base
    # both sources' insertions drew from ONE pool
    per_source = (a._reserved_cell[0], b._reserved_cell[0])
    assert used == sum(per_source) and all(n > 0 for n in per_source)

    del a
    gc.collect()
    assert ld._cache_used[0] - base == per_source[1]  # a's bytes returned
    del b
    gc.collect()
    assert ld._cache_used[0] == base


def test_cache_budget_starvation_is_shared_not_per_source(db):
    """With a pool already near-full, a second source cannot reserve a
    fresh full budget for itself (the pre-fix behavior): its inserts are
    refused, and it still serves bit-correct samples uncached."""
    import gc

    from fhpe_tpu.data import loader as ld

    meta = dataset_meta("mpii")
    gc.collect()
    cfg = _cfg(1)  # 1 MB total pool
    filler = PoseDataSource(cfg, db, is_train=True,
                            flip_pairs=meta["flip_pairs"],
                            upper_body_ids=meta["upper_body_ids"])
    # occupy all but a sliver of the pool (smaller than one 96x96 image)
    assert filler._cache_reserve((1 << 20) - ld._cache_used[0] - 1000)

    other = PoseDataSource(cfg, db, is_train=False,
                           flip_pairs=meta["flip_pairs"],
                           upper_body_ids=meta["upper_body_ids"])
    s = other.get_sample(0)
    # pre-fix, `other` would have had its own fresh 1 MB budget and
    # cached freely; with the shared pool its insert is refused
    assert other._reserved_cell[0] == 0
    assert s["image"].shape[0] == 64  # still correct, just uncached
    del filler, other
    gc.collect()
