"""import_torch CLI: .pth -> msgpack -> usable as model weights."""

import sys

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp
from flax import serialization

torch = pytest.importorskip("torch")


def test_import_torch_cli_roundtrip(tmp_path):
    sys.path.insert(0, "/root/reference/lib")
    from types import SimpleNamespace
    import models.hourglass as ref_hg

    from fhpe_tpu.cli import import_torch as cli
    from fhpe_tpu.config import load_config
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.utils.checkpoint import load_model_weights

    stacks, feats, joints = 1, 64, 8
    rcfg = SimpleNamespace(MODEL=SimpleNamespace(
        EXTRA=SimpleNamespace(NUM_FEATURES=feats, NUM_STACKS=stacks,
                              NUM_BLOCKS=1),
        NUM_JOINTS=joints))
    tmodel = ref_hg.get_pose_net(rcfg, is_train=False).eval()
    pth = tmp_path / "teacher.pth"
    torch.save({"state_dict": {f"module.{k}": v for k, v in
                               tmodel.state_dict().items()}}, str(pth))

    cfg_yaml = {
        "MODEL": {"NAME": "hourglass", "NUM_JOINTS": joints,
                  "IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                  "EXTRA": {"NUM_FEATURES": feats, "NUM_STACKS": stacks,
                            "NUM_BLOCKS": 1}}}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))
    dst = tmp_path / "teacher.msgpack"

    old = sys.argv
    sys.argv = ["import_torch", "--cfg", str(cfg_path), "--src", str(pth),
                "--dst", str(dst)]
    try:
        cli.main()
    finally:
        sys.argv = old
    assert dst.exists()

    # imported weights reproduce the torch forward
    cfg = load_config(str(cfg_path))
    model = get_pose_net(cfg, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    w = load_model_weights(str(dst))
    variables = serialization.from_state_dict(init, w)
    ours = np.asarray(model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False))[-1]
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x))[-1].numpy()
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref,
                               rtol=1e-3, atol=1e-4)
