"""Subprocess children for the CLI-vs-CLI epoch-loop parity rehearsal.

Two modes, one per framework, launched by tests/test_epoch_loop_parity.py:

* ``ref``  — drives the ACTUAL reference ``tools/train.py`` ``main()``
  (torch CPU, float64 model) end to end on a synthetic-MPII root:
  config merge -> logger -> model summary -> loaders -> AUTO_RESUME ->
  per-epoch scheduler/train/validate/best-checkpoint -> final_state
  (``/root/reference/tools/train.py:99-245``).
* ``ours`` — drives ``fhpe_tpu.cli.train.main()`` on the same YAML, same
  data root, float64 compute, warm-started from the reference's dumped
  init ``state_dict`` via the production TRAIN.CHECKPOINT path.

Each prints one ``EPOCH_LOOP_RESULT {json}`` line recording the per-epoch
LR actually used, the per-epoch validate perf (MPII PCKh Mean), the
best-checkpoint decision sequence, and the final-state parameter pytree
(flattened stats) for cross-checking.  Runs in a subprocess because the
reference side needs heavy import stubbing and ours enables jax x64.
"""

from __future__ import annotations

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SEED = 31


def run_reference(cfg_yaml, sd0_path, outdir, logdir, root):
    import numpy as np
    import torch

    import reference_oracle
    reference_oracle.install()

    # the reference predates numpy 1.24: restore the removed scalar
    # aliases it uses (np.float in mpii._get_db) — child process only
    for alias, typ in (("float", float), ("int", int), ("bool", bool),
                       ("object", object), ("str", str)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    # torchvision.transforms stand-in reproducing torchvision's float32
    # ToTensor (/255) + Normalize math bit-exactly (what tools/train.py
    # composes at :151-176); fhpe's on-device normalize_images_jax is
    # bit-identical to this (tests/test_epoch_loop_parity.py preflight).
    tr = types.ModuleType("torchvision.transforms")

    class ToTensor:
        def __call__(self, pic):
            return (torch.from_numpy(np.ascontiguousarray(
                pic.transpose(2, 0, 1))).float().div(255.0))

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
            self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    tr.ToTensor, tr.Normalize, tr.Compose = ToTensor, Normalize, Compose
    sys.modules["torchvision"].transforms = tr
    sys.modules["torchvision.transforms"] = tr

    # tensorboardX: no-op writer (tools/train.py add_graph would trace the
    # model; observability is not the layer under test here)
    tbx = types.ModuleType("tensorboardX")

    class SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, name):
            return lambda *a, **k: None

    tbx.SummaryWriter = SummaryWriter
    sys.modules["tensorboardX"] = tbx

    # CPU run: .cuda() no-ops, DataParallel -> passthrough that keeps the
    # ``module`` child (so state_dict keys keep the ``module.`` prefix the
    # reference checkpoints have) and casts inputs to the double model
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    class Passthrough(torch.nn.Module):
        def __init__(self, module, device_ids=None):
            super().__init__()
            self.module = module

        def forward(self, x):
            return self.module(x.double())

    torch.nn.DataParallel = Passthrough

    # float64 everywhere a fresh tensor feeds the model (dump_input)
    _orig_rand = torch.rand
    torch.rand = lambda *a, **k: _orig_rand(*a, **k).double()

    sys.path.insert(0, "/root/reference/tools")

    # deterministic double model; dump the init state_dict for ``ours``
    import models.hourglass as ref_hg
    orig_factory = ref_hg.get_pose_net

    def seeded_factory(cfg, is_train, **kw):
        torch.manual_seed(SEED)
        m = orig_factory(cfg, is_train, **kw).double()
        torch.save(m.state_dict(), sd0_path)
        return m

    ref_hg.get_pose_net = seeded_factory

    # loss: targets arrive float32 from the loader; cast to the model dtype
    # (method patch, not a subclass: the reference __init__ uses
    # legacy-style ``super(JointsMSELoss, self)`` which breaks if the
    # module global is rebound)
    import core.loss as ref_loss
    _orig_fwd = ref_loss.JointsMSELoss.forward

    def cast_fwd(self, output, target, target_weight):
        return _orig_fwd(self, output, target.to(output.dtype),
                         target_weight.to(output.dtype))

    ref_loss.JointsMSELoss.forward = cast_fwd

    import train as tools_train  # /root/reference/tools/train.py

    out = {"lr": [], "perf": [], "best": []}
    orig_train, orig_validate = tools_train.train, tools_train.validate
    orig_save = tools_train.save_checkpoint

    def rec_train(config, loader, model, criterion, optimizer, epoch, *a,
                  **k):
        out["lr"].append(float(optimizer.param_groups[0]["lr"]))
        return orig_train(config, loader, model, criterion, optimizer,
                          epoch, *a, **k)

    def rec_validate(*a, **k):
        perf = orig_validate(*a, **k)
        out["perf"].append(float(perf))
        return perf

    def rec_save(states, is_best, *a, **k):
        out["best"].append(bool(is_best))
        return orig_save(states, is_best, *a, **k)

    tools_train.train = rec_train
    tools_train.validate = rec_validate
    tools_train.save_checkpoint = rec_save

    sys.argv = ["train", "--cfg", cfg_yaml,
                "OUTPUT_DIR", outdir, "LOG_DIR", logdir,
                "DATASET.ROOT", root, "GPUS", "(0,)"]
    tools_train.main()

    # final_state.pth: the weights the reference ships after the loop
    final = None
    for dirpath, _, files in os.walk(outdir):
        if "final_state.pth" in files:
            final = os.path.join(dirpath, "final_state.pth")
    assert final, f"reference final_state.pth not found under {outdir}"
    out["final_state"] = final
    print("EPOCH_LOOP_RESULT " + json.dumps(out), flush=True)


def run_ours(cfg_yaml, sd0_path, outdir, logdir, root, warm_path):
    # convert the reference init state_dict into a warm-start weight file
    # through the production importer, then drive the real CLI main()
    from flax import serialization

    from fhpe_tpu.config import load_config
    from fhpe_tpu.utils.torch_import import (import_for_model,
                                             load_torch_state_dict)

    cfg = load_config(cfg_yaml, opts=["DATASET.ROOT", root])
    variables = import_for_model(cfg, load_torch_state_dict(sd0_path))
    with open(warm_path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))

    from fhpe_tpu.cli import train as cli_train

    out = {"lr": [], "perf": [], "best": []}
    orig_validate, orig_save = cli_train.validate, cli_train.save_checkpoint
    orig_set_lr = cli_train.set_lr

    def rec_set_lr(state, lr):
        out["lr"].append(float(lr))
        return orig_set_lr(state, lr)

    def rec_validate(*a, **k):
        r = orig_validate(*a, **k)
        out["perf"].append(float(r[0]))
        return r

    def rec_save(output_dir, state, epoch, perf, is_best, **k):
        out["best"].append(bool(is_best))
        return orig_save(output_dir, state, epoch, perf, is_best, **k)

    cli_train.set_lr = rec_set_lr
    cli_train.validate = rec_validate
    cli_train.save_checkpoint = rec_save

    sys.argv = ["train", "--cfg", cfg_yaml,
                "OUTPUT_DIR", outdir, "LOG_DIR", logdir,
                "DATASET.ROOT", root,
                "TPU.COMPUTE_DTYPE", "float64",
                "TRAIN.CHECKPOINT", warm_path]
    cli_train.main()

    final = None
    for dirpath, _, files in os.walk(outdir):
        if "final_state.msgpack" in files:
            final = os.path.join(dirpath, "final_state.msgpack")
    assert final, f"final_state.msgpack not found under {outdir}"
    out["final_state"] = final
    print("EPOCH_LOOP_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "ref":
        run_reference(*sys.argv[2:7])
    elif mode == "ours":
        run_ours(*sys.argv[2:8])
    else:
        raise SystemExit(f"unknown mode {mode}")
