"""TRAIN.SEED knob: bit-reproducible runs at equal seed, independent
augmentation/shuffle/init streams across seeds (TPU-build extension; the
reference has no seed control — tools/train.py trains CUDA-nondeterministic).
"""

import numpy as np
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.data import dataset_meta, make_synthetic_db
from fhpe_tpu.data.loader import BatchLoader, PoseDataSource


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d = tmp_path_factory.mktemp("seed_db")
    return make_synthetic_db(str(d), 12, 16, (96, 96))


def _first_batch(db, seed):
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.TRAIN.SEED = seed
    meta = dataset_meta("mpii")
    seed = int(cfg.TRAIN.get("SEED", 0))
    src = PoseDataSource(cfg, db, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"], seed=seed)
    loader = BatchLoader(src, batch_size=8, shuffle=True, drop_last=True,
                         host_targets=True, num_threads=2, seed=seed)
    return next(iter(loader))


def test_same_seed_bit_reproducible(db):
    a, b = _first_batch(db, 3), _first_batch(db, 3)
    for k in a:
        if k == "image_path":
            assert a[k] == b[k]
        else:
            np.testing.assert_array_equal(a[k], b[k])


def test_different_seed_changes_stream(db):
    a, b = _first_batch(db, 0), _first_batch(db, 1)
    assert (a["image_path"] != b["image_path"]          # shuffle stream
            or not np.array_equal(a["image"], b["image"]))


def test_seed_reaches_init_rng():
    from fhpe_tpu.cli import train as train_cli
    src = open(train_cli.__file__).read()
    assert 'PRNGKey(int(cfg.TRAIN.get("SEED", 0)))' in src
    from fhpe_tpu.cli import fpd_train as fpd_cli
    assert 'PRNGKey(int(cfg.TRAIN.get("SEED", 0)))' in open(
        fpd_cli.__file__).read()
