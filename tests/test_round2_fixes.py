"""Round-2 fixes: loader RNG reproducibility, DEVICE_WARP half-pixel
convention, windowed train-loop meters, per-module summary table.

Covers the round-1 advisor findings (ADVICE.md) and VERDICT items #8/#9.
"""

import numpy as np
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.data import (BatchLoader, PoseDataSource, dataset_meta,
                           make_synthetic_db)
from fhpe_tpu.utils.logger import WindowedMeters


def _cfg(**tpu):
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.MODEL.HEATMAP_SIZE = [32, 32]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.DATASET.SCALE_FACTOR = 0.25
    cfg.DATASET.ROT_FACTOR = 30
    for k, v in tpu.items():
        cfg.TPU[k] = v
    return cfg


def _source(db, seed=5, cfg=None):
    meta = dataset_meta("mpii")
    return PoseDataSource(cfg or _cfg(), db, is_train=True,
                          flip_pairs=meta["flip_pairs"],
                          upper_body_ids=meta["upper_body_ids"], seed=seed)


def test_loader_reproducible_across_thread_counts(tmp_path):
    """Augmentation draws happen on the iterating thread in batch order, so
    two runs with identical seeds must produce identical augmented batches
    even under different pool geometries (ADVICE.md finding #3: the shared
    RandomState used to be consumed in thread-scheduling order)."""
    db = make_synthetic_db(str(tmp_path), num_samples=24, image_hw=(180, 240))

    def run(num_threads, prefetch):
        loader = BatchLoader(_source(db), batch_size=4, shuffle=True,
                             host_targets=True, num_threads=num_threads,
                             prefetch=prefetch, seed=7)
        out = []
        for batch in loader:
            out.append((batch["rotation"].copy(), batch["scale"].copy(),
                        batch["joints"].copy(), batch["image"].copy()))
        return out

    a = run(num_threads=1, prefetch=1)
    b = run(num_threads=8, prefetch=3)
    assert len(a) == len(b)
    for (ra, sa, ja, ia), (rb, sb, jb, ib) in zip(a, b):
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ja, jb)
        np.testing.assert_array_equal(ia, ib)


def test_inline_draws_match_predrawn_params(tmp_path):
    """get_sample(idx) with inline draws equals get_sample(idx, params=...)
    with params drawn from an identically-seeded source."""
    db = make_synthetic_db(str(tmp_path), num_samples=6, image_hw=(180, 240))
    src_a, src_b = _source(db, seed=13), _source(db, seed=13)
    for i in range(6):
        sa = src_a.get_sample(i, host_targets=True)
        p = src_b.draw_augment_params(i)
        sb = src_b.get_sample(i, host_targets=True, params=p)
        np.testing.assert_array_equal(sa["image"], sb["image"])
        np.testing.assert_array_equal(sa["joints"], sb["joints"])
        np.testing.assert_allclose(sa["rotation"], sb["rotation"])


def test_device_warp_matrix_uses_pixel_center_convention(tmp_path):
    """The composed dst->canvas affine must map through cv2.resize's
    pixel-center convention, canvas = (src + 0.5)*fit - 0.5, not a pure row
    scale (ADVICE.md finding #2: ~0.5*(1-fit) px top-left bias)."""
    from fhpe_tpu.geometry.affine import (affine_transform,
                                          get_affine_transform)

    cfg = _cfg(DEVICE_WARP=True, CANVAS_SIZE=[256, 256])
    cfg.DATASET.FLIP = False
    db = make_synthetic_db(str(tmp_path), num_samples=2, image_hw=(300, 400))
    src = _source(db, seed=3, cfg=cfg)
    s = src.get_sample(0)
    assert "warp_inv" in s

    # Recompute the expected mapping independently: dst -> src via the
    # inverse crop affine, then src -> canvas via the resize convention.
    rec = src.db[0]
    p2 = _source(db, seed=3, cfg=cfg).draw_augment_params(0)
    inv = get_affine_transform(p2["c"], p2["s"], p2["r"],
                               src.image_size, inv=True)
    w_img, h_img = 400, 300
    fit = min(256 / w_img, 256 / h_img)
    rw, rh = int(round(w_img * fit)), int(round(h_img * fit))
    fx, fy = rw / w_img, rh / h_img
    for dst in [(0.0, 0.0), (64.0, 32.0), (127.0, 127.0)]:
        src_pt = affine_transform(np.array(dst), inv)
        expected = np.array([(src_pt[0] + 0.5) * fx - 0.5,
                             (src_pt[1] + 0.5) * fy - 0.5])
        got = affine_transform(np.array(dst), s["warp_inv"].astype(np.float64))
        np.testing.assert_allclose(got, expected, atol=1e-4)


def test_windowed_meters_average_every_step():
    m = WindowedMeters(value_keys=("loss",))
    vals = [1.0, 2.0, 3.0, 4.0]
    for v in vals:
        m.push({"loss": np.float32(v), "acc": np.float32(v / 10),
                "acc_cnt": np.int32(2)}, batch_size=8)
    m.drain()
    assert m["loss"].count == 32          # every step counted, not sampled
    np.testing.assert_allclose(m["loss"].avg, np.mean(vals))
    np.testing.assert_allclose(m["acc"].avg, np.mean(vals) / 10)
    assert m["acc"].count == 8            # weighted by acc_cnt
    assert m.batch_time.count == 4
    assert m.speed > 0
    # second window starts clean
    m.push({"loss": np.float32(10.0)}, batch_size=8)
    m.drain()
    assert m.batch_time.count == 5


def test_per_module_summary_table():
    import jax.numpy as jnp
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.utils.summary import get_model_summary

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_FEATURES = 64
    model = get_pose_net(cfg, dtype=jnp.float32)
    s = get_model_summary(model, (64, 64))
    assert s["modules"], "per-module rows missing"
    assert sum(n for _, n in s["modules"]) == s["params"]
    # every module row appears in the printable table
    for name, _ in s["modules"]:
        assert name in s["text"]
    assert "Total Parameters" in s["text"]


def test_per_module_flops_in_summary():
    """Round-4 verdict missing #2: the reference summary prints FLOPs per
    module (lib/utils/utils.py:86-202); ours must too (via flax tabulate
    compute_flops), and the whole-model GFLOPs line must never be silent."""
    import jax.numpy as jnp
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.utils.summary import get_model_summary

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_FEATURES = 16
    model = get_pose_net(cfg, dtype=jnp.float32)
    s = get_model_summary(model, (64, 64))
    assert s["module_flops_table"], "per-module FLOPs table missing"
    assert "flops" in s["module_flops_table"].lower()
    # a known submodule appears as a row with a FLOPs figure
    assert "stem" in s["module_flops_table"] or "hg" in s["module_flops_table"]
    # GFLOPs line is either the number or an explicit 'unavailable' marker
    assert ("Forward GFLOPs" in s["text"])
    # abstract CPU lowering must yield a real count (no init, no compile)
    assert s["flops"] and s["flops"] > 1e6


def test_dump_hlo_writes_module_graph(tmp_path):
    """dump_hlo is the TB add_graph substitute (tools/train.py:129-138):
    abstract-args CPU lowering, so no device traffic for a text dump."""
    import jax.numpy as jnp
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.utils.summary import dump_hlo

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_FEATURES = 16
    model = get_pose_net(cfg, dtype=jnp.float32)
    path = str(tmp_path / "fwd.stablehlo.txt")
    assert dump_hlo(model, (64, 64), path)
    text = open(path).read()
    assert "stablehlo" in text or "module" in text
    assert "convolution" in text  # the graph actually contains the model
