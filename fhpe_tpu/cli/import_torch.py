"""Convert a reference PyTorch checkpoint into this framework's weights.

Usage:
  python -m fhpe_tpu.cli.import_torch --cfg <model cfg yaml> \
      --src <weights.pth> --dst <weights.msgpack>

Loads any of the reference's checkpoint formats (utils/torch_import.py),
maps onto the flax tree for cfg.MODEL, validates against a fresh init
(shape-checked), and writes a ``{"params", "batch_stats"}`` msgpack usable
as KD.TEACHER / TRAIN.CHECKPOINT / TEST.MODEL_FILE.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
from flax import serialization

from ..config import load_config
from ..models import get_pose_net
from ..utils.torch_import import import_for_model, load_torch_state_dict


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--src", required=True, help="torch .pth checkpoint")
    p.add_argument("--dst", required=True, help="output .msgpack path")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = load_config(args.cfg, opts=args.opts)
    model = get_pose_net(cfg, dtype=jnp.float32)
    sample = jnp.zeros((1, cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0], 3))
    init = model.init(jax.random.PRNGKey(0), sample, train=False)

    sd = load_torch_state_dict(args.src)
    imported = import_for_model(cfg, sd)
    variables = serialization.from_state_dict(init, imported)

    payload = {
        "params": serialization.to_state_dict(variables["params"]),
        "batch_stats": serialization.to_state_dict(
            variables.get("batch_stats", {})),
    }
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(lambda x: __import__("numpy").asarray(x),
                                   payload)))
    print(f"imported {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
