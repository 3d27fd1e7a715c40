"""Data pipeline, preprocessing-op, and synthetic-dataset tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from fhpe_tpu.config import get_default_config
from fhpe_tpu.data import BatchLoader, PoseDataSource, dataset_meta, make_synthetic_db
from fhpe_tpu.geometry import get_affine_transform
from fhpe_tpu.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                     normalize_images_jax, warp_affine_jax)

cv2 = pytest.importorskip("cv2")


def _cfg():
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.MODEL.HEATMAP_SIZE = [32, 32]
    cfg.DATASET.PROB_HALF_BODY = 0.3
    return cfg


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synt")
    db = make_synthetic_db(str(out), num_samples=10, image_hw=(200, 260))
    return db


def test_source_sample_shapes(synth):
    cfg = _cfg()
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, synth, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    s = src.get_sample(0, host_targets=True)
    assert s["image"].shape == (128, 128, 3)
    assert s["image"].dtype == np.uint8
    assert s["joints"].shape == (16, 2)
    assert s["target"].shape == (32, 32, 16)
    assert s["target_weight"].shape == (16,)


def test_eval_sample_deterministic(synth):
    cfg = _cfg()
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, synth, is_train=False,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    a = src.get_sample(3)
    b = src.get_sample(3)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["joints"], b["joints"])


def test_batch_loader_epoch(synth):
    cfg = _cfg()
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, synth, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    loader = BatchLoader(src, batch_size=4, shuffle=True, host_targets=True)
    batches = list(loader)
    assert len(batches) == 3  # 10 samples / bs 4 -> 3 (last padded)
    assert all(b["image"].shape == (4, 128, 128, 3) for b in batches)
    assert batches[-1]["valid"].sum() == 2
    assert batches[0]["valid"].all()


def test_warp_affine_matches_cv2(synth):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(2, 100, 140, 3), dtype=np.uint8)
    out_size = (64, 48)  # (w, h)
    invs = []
    cv2_out = []
    for i in range(2):
        center = rng.uniform(40, 90, size=2)
        scale = rng.uniform(0.3, 0.6, size=2)
        rot = rng.uniform(-40, 40)
        fwd = get_affine_transform(center, scale, rot, out_size)
        inv = get_affine_transform(center, scale, rot, out_size, inv=True)
        invs.append(inv)
        cv2_out.append(cv2.warpAffine(img[i], fwd.astype(np.float32),
                                      out_size, flags=cv2.INTER_LINEAR))
    ours = np.asarray(warp_affine_jax(jnp.asarray(img),
                                      jnp.asarray(np.stack(invs)), out_size))
    ref = np.stack(cv2_out).astype(np.float32)
    # cv2 uses fixed-point bilinear (5-bit fractional); allow ~1 intensity.
    assert np.abs(ours - ref).max() <= 1.5
    assert np.mean(np.abs(ours - ref) > 1.0) < 0.01


def test_normalize_images():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, size=(2, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(normalize_images_jax(jnp.asarray(img)))
    ref = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_flip_and_rotation_augmentation_fire(synth):
    """Train-time flip (p=0.5) and rotation (p=0.6) must both actually
    fire across samples — and both sometimes not fire."""
    cfg = _cfg()
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, synth, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"], seed=7)
    samples = [src.get_sample(i % 10) for i in range(20)]
    rotations = [float(s["rotation"]) for s in samples]
    flips = [bool(s["flipped"]) for s in samples]
    assert any(r != 0 for r in rotations)
    assert any(r == 0 for r in rotations)
    assert any(flips) and not all(flips)


def test_batchloader_process_sharding(synth):
    """Multi-host semantics: every process draws the same global
    permutation and yields its contiguous slice of each global batch —
    slices are disjoint, ordered, and their union is the global batch."""
    cfg = _cfg()
    meta = dataset_meta("mpii")

    def collect(pi, pc):
        src = PoseDataSource(cfg, list(synth) * 2, is_train=False,
                             flip_pairs=meta["flip_pairs"],
                             upper_body_ids=meta["upper_body_ids"])
        loader = BatchLoader(src, batch_size=8, shuffle=True, drop_last=True,
                             host_targets=True, seed=3,
                             process_index=pi, process_count=pc)
        return [b["image_path"] for b in loader]

    world = [collect(pi, 4) for pi in range(4)]
    ref = collect(0, 1)
    assert all(len(w) == len(ref) for w in world)
    for bi, full in enumerate(ref):
        merged = [p for w in world for p in w[bi]]
        assert merged == list(full)  # disjoint cover, in order
        for w in world:
            assert len(w[bi]) == 2  # 8 / 4 processes

    with pytest.raises(ValueError):
        BatchLoader(PoseDataSource(cfg, list(synth), is_train=False,
                                   flip_pairs=meta["flip_pairs"],
                                   upper_body_ids=meta["upper_body_ids"]),
                    batch_size=6, process_index=0, process_count=4)
