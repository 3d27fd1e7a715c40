"""Native C++ host image path (ops/cpp/imagedec.cpp via ops/native_image).

Counterpart of the reference's cv2.imread + cv2.warpAffine data path
(lib/dataset/JointsDataset.py:120-172).  Parity contract:

* JPEG decode: bit-identical to cv2.imread (both are libjpeg-turbo with
  islow DCT + fancy upsampling) — baseline, progressive, grayscale, odd
  dimensions.
* Affine warp: replicates cv2 5's float warpAffine engine; equality up to
  ±1 at exact .5 rounding ties (~1 per million pixels in fuzzing, cv2's
  own SIMD-body/scalar-tail inconsistency).
* flip_src mode: BIT-identical to warping a materialized img[:, ::-1]
  through the native warp (same fractions, mirrored taps).
* Loader integration: TPU.NATIVE_DECODE + NATIVE_WARP produce the same
  batches as the cv2 path (same tie tolerance on pixels; all geometry
  and targets exactly equal).
"""

import numpy as np
import pytest

from fhpe_tpu.geometry.affine import get_affine_transform
from fhpe_tpu.ops import native_image as ni

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not ni.available(),
                                reason="libfhpe_image.so unavailable")


def _warp_close(ref: np.ndarray, got: np.ndarray, tie_budget: int = 4):
    """Equality up to ±1 at isolated rounding ties."""
    d = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    assert d.max() <= 1, f"maxdiff {d.max()} > 1"
    assert (d > 0).sum() <= tie_budget, \
        f"{(d > 0).sum()} differing values (allowed {tie_budget})"


# ------------------------------------------------------------- decode ---

@pytest.mark.parametrize("hw,quality,progressive", [
    ((64, 96), 90, False),
    ((123, 77), 75, False),     # odd dims exercise chroma edge handling
    ((200, 151), 95, True),     # progressive scan path
    ((33, 41), 100, False),
])
def test_jpeg_decode_bit_identical(hw, quality, progressive):
    rng = np.random.RandomState(sum(hw) + quality)
    img = rng.randint(0, 256, (*hw, 3), np.uint8)
    flags = [int(cv2.IMWRITE_JPEG_QUALITY), quality]
    if progressive:
        flags += [int(cv2.IMWRITE_JPEG_PROGRESSIVE), 1]
    ok, buf = cv2.imencode(".jpg", img, flags)
    assert ok
    ref = cv2.imdecode(buf, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    got = ni.decode_jpeg_bytes(buf.tobytes(), bgr=True)
    np.testing.assert_array_equal(ref, got)
    # RGB order decode == BGR decode reversed (single libjpeg conversion)
    got_rgb = ni.decode_jpeg_bytes(buf.tobytes(), bgr=False)
    np.testing.assert_array_equal(ref[:, :, ::-1], got_rgb)


def test_jpeg_dims_fast_matches_c_header_parse():
    """The pure-Python SOF scan (single-header-parse fast path) must agree
    with libjpeg's header parse on every encoder variant, and reject
    non-JPEG bytes so the caller falls back."""
    import ctypes
    lib = ni.get_lib()
    rng = np.random.RandomState(3)
    cases = []
    for hw in [(64, 96), (123, 77), (1, 1), (17, 513)]:
        img = rng.randint(0, 256, (*hw, 3), np.uint8)
        for flags in ([int(cv2.IMWRITE_JPEG_QUALITY), 80],
                      [int(cv2.IMWRITE_JPEG_PROGRESSIVE), 1],
                      [int(cv2.IMWRITE_JPEG_OPTIMIZE), 1]):
            ok, buf = cv2.imencode(".jpg", img, flags)
            assert ok
            cases.append(buf.tobytes())
    gray = rng.randint(0, 256, (40, 60), np.uint8)
    cases.append(cv2.imencode(".jpg", gray)[1].tobytes())
    for buf in cases:
        got = ni._jpeg_dims_fast(buf)
        src = np.frombuffer(buf, dtype=np.uint8)
        w = ctypes.c_int(); h = ctypes.c_int(); c = ctypes.c_int()
        assert lib.fhpe_jpeg_dims(
            src.ctypes.data_as(ni._u8p), src.size, ctypes.byref(w),
            ctypes.byref(h), ctypes.byref(c)) == 0
        assert got == (h.value, w.value), (got, h.value, w.value)
    assert ni._jpeg_dims_fast(b"") is None
    assert ni._jpeg_dims_fast(b"\x89PNG\r\n\x1a\n") is None
    assert ni._jpeg_dims_fast(b"\xff\xd8\xff") is None


def test_jpeg_decode_grayscale_source():
    rng = np.random.RandomState(9)
    gray = rng.randint(0, 256, (50, 70), np.uint8)
    ok, buf = cv2.imencode(".jpg", gray)
    assert ok
    ref = cv2.imdecode(buf, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    got = ni.decode_jpeg_bytes(buf.tobytes(), bgr=True)
    np.testing.assert_array_equal(ref, got)


def test_imread_native_file_and_fallbacks(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 60, 3), np.uint8)
    jpath = str(tmp_path / "a.jpg")
    cv2.imwrite(jpath, img)
    ref = cv2.imread(jpath, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    np.testing.assert_array_equal(ref, ni.imread_native(jpath))
    # non-JPEG extension and missing file -> None (caller falls back)
    ppath = str(tmp_path / "a.png")
    cv2.imwrite(ppath, img)
    assert ni.imread_native(ppath) is None
    assert ni.imread_native(str(tmp_path / "missing.jpg")) is None
    # corrupt payload -> None, not a crash
    (tmp_path / "bad.jpg").write_bytes(b"\xff\xd8\xff garbage")
    assert ni.imread_native(str(tmp_path / "bad.jpg")) is None


# --------------------------------------------------------------- warp ---

def test_warp_affine_pose_transforms():
    rng = np.random.RandomState(1)
    for _ in range(8):
        h, w = rng.randint(40, 300), rng.randint(40, 300)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        c = np.array([rng.uniform(-50, w + 50), rng.uniform(-50, h + 50)])
        s = np.array([rng.uniform(0.2, 3.0), rng.uniform(0.2, 3.0)])
        r = rng.uniform(-90, 90)
        M = get_affine_transform(c, s, r, np.array([256, 256]))
        ref = cv2.warpAffine(img, M, (256, 256), flags=cv2.INTER_LINEAR)
        got = ni.warp_affine_native(img, M, (256, 256))
        _warp_close(ref, got)


def test_warp_affine_random_matrices():
    rng = np.random.RandomState(2)
    for _ in range(10):
        h, w = rng.randint(8, 200), rng.randint(8, 200)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        M = rng.uniform(-2, 2, (2, 3)).astype(np.float64)
        M[:, 2] = rng.uniform(-100, 100, 2)
        dsize = (rng.randint(4, 128), rng.randint(4, 128))
        ref = cv2.warpAffine(img, M, dsize, flags=cv2.INTER_LINEAR)
        got = ni.warp_affine_native(img, M, dsize)
        _warp_close(ref, got)


def test_warp_affine_grayscale_and_identity():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (64, 48), np.uint8)
    M = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    got = ni.warp_affine_native(img, M, (48, 64))
    assert got.shape == (64, 48)
    np.testing.assert_array_equal(img, got)  # identity is exact


def test_warp_fully_outside_is_zero():
    img = np.full((32, 32, 3), 255, np.uint8)
    M = np.array([[1.0, 0.0, 1e6], [0.0, 1.0, 1e6]])
    got = ni.warp_affine_native(img, M, (16, 16))
    assert int(got.max()) == 0


def test_flip_src_bit_equals_materialized_flip():
    rng = np.random.RandomState(5)
    for _ in range(6):
        h, w = rng.randint(30, 200), rng.randint(30, 200)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        c = np.array([rng.uniform(0, w), rng.uniform(0, h)])
        s = np.array([rng.uniform(0.3, 2.0)] * 2)
        r = rng.uniform(-45, 45)
        M = get_affine_transform(c, s, r, np.array([192, 256]))
        flipped = np.ascontiguousarray(img[:, ::-1])
        ref = ni.warp_affine_native(flipped, M, (192, 256))
        got = ni.warp_affine_native(img, M, (192, 256), flip_src=True)
        np.testing.assert_array_equal(ref, got)  # exact: same fractions


def test_read_image_zip_member_native(tmp_path):
    import zipfile
    from fhpe_tpu.data.loader import _read_image

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (50, 70, 3), np.uint8)
    jpg = cv2.imencode(".jpg", img)[1].tobytes()
    zpath = tmp_path / "imgs.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("sub/a.jpg", jpg)
    path = f"{zpath}@/sub/a.jpg"
    ref = _read_image(path, color_rgb=False, native=False)
    got = _read_image(path, color_rgb=False, native=True)
    np.testing.assert_array_equal(ref, got)
    ref_rgb = _read_image(path, color_rgb=True, native=False)
    got_rgb = _read_image(path, color_rgb=True, native=True)
    np.testing.assert_array_equal(ref_rgb, got_rgb)


# -------------------------------------------------- loader integration ---

def test_loader_native_path_matches_cv2_path(tmp_path):
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.data import dataset_meta, make_synthetic_db
    from fhpe_tpu.data.loader import PoseDataSource

    db = make_synthetic_db(str(tmp_path / "db"), 6, 16, (120, 160))
    meta = dataset_meta("mpii")

    def run(native):
        cfg = get_default_config()
        cfg.MODEL.NUM_JOINTS = 16
        cfg.MODEL.IMAGE_SIZE = [64, 64]
        cfg.MODEL.HEATMAP_SIZE = [16, 16]
        cfg.DATASET.FLIP = True
        cfg.TPU.NATIVE_DECODE = native
        cfg.TPU.NATIVE_WARP = native
        src = PoseDataSource(cfg, db, is_train=True,
                             flip_pairs=meta["flip_pairs"],
                             upper_body_ids=meta["upper_body_ids"], seed=11)
        return [src.get_sample(i, host_targets=True) for i in range(len(db))]

    ref_s = run(False)
    got_s = run(True)
    flips = 0
    for a, b in zip(ref_s, got_s):
        for k in a:
            if k == "image":
                _warp_close(a[k], b[k])
            elif k == "image_path":
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]))
        flips += bool(a["flipped"])
    assert flips >= 1  # the flip-elision path was actually exercised


def test_batchloader_native_threads(tmp_path):
    """ctypes calls release the GIL — run the native path through the
    threaded BatchLoader and pin batches against the cv2 path."""
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.data import dataset_meta, make_synthetic_db
    from fhpe_tpu.data.loader import BatchLoader, PoseDataSource

    db = make_synthetic_db(str(tmp_path / "db"), 12, 16, (120, 160))
    meta = dataset_meta("mpii")

    def epoch(native):
        cfg = get_default_config()
        cfg.MODEL.NUM_JOINTS = 16
        cfg.MODEL.IMAGE_SIZE = [64, 64]
        cfg.MODEL.HEATMAP_SIZE = [16, 16]
        cfg.TPU.NATIVE_DECODE = native
        cfg.TPU.NATIVE_WARP = native
        src = PoseDataSource(cfg, db, is_train=True,
                             flip_pairs=meta["flip_pairs"],
                             upper_body_ids=meta["upper_body_ids"], seed=7)
        loader = BatchLoader(src, batch_size=4, shuffle=True,
                             drop_last=True, host_targets=True,
                             num_threads=4, seed=7)
        return list(loader)

    for a, b in zip(epoch(False), epoch(True)):
        for k in a:
            if k == "image":
                _warp_close(a[k], b[k], tie_budget=8)
            elif k == "image_path":
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]))
