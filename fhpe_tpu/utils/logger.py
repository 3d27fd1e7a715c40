"""Run-directory layout, logging, meters, and result tables.

Mirrors the reference observability surface: timestamped
``output/<dataset>/<model>/<cfg>_<time>/`` run dir with ``running.log`` and
a TensorBoard dir (``lib/utils/utils.py:23-55``), the ``AverageMeter``
(function.py:356-371), and the markdown result-table printer
(function.py:336-353).
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path


def create_logger(cfg, cfg_name: str, phase: str = "train"):
    """(logger, final_output_dir, tb_log_dir)."""
    root_output_dir = Path(cfg.OUTPUT_DIR or "output")
    root_output_dir.mkdir(parents=True, exist_ok=True)

    dataset = cfg.DATASET.DATASET
    model = cfg.MODEL.NAME
    cfg_name = os.path.basename(cfg_name).split(".")[0]
    time_str = time.strftime("%Y-%m-%d-%H-%M")

    final_output_dir = root_output_dir / dataset / model / f"{cfg_name}_{time_str}"
    final_output_dir.mkdir(parents=True, exist_ok=True)

    log_file = final_output_dir / "running.log"
    head = "%(asctime)-15s %(message)s"
    logging.basicConfig(filename=str(log_file), format=head)
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    console = logging.StreamHandler()
    console.setFormatter(logging.Formatter(head))
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        logger.addHandler(console)

    tb_log_dir = (Path(cfg.LOG_DIR or "log") / dataset / model /
                  f"{cfg_name}_{time_str}")
    tb_log_dir.mkdir(parents=True, exist_ok=True)
    return logger, str(final_output_dir), str(tb_log_dir)


class AverageMeter:
    """Running average (reference function.py:356-371)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count != 0 else 0.0


def print_name_value(logger, name_value, full_arch_name: str):
    """Markdown results table (reference function.py:336-353)."""
    names = list(name_value.keys())
    values = list(name_value.values())
    num_values = len(name_value)
    logger.info("| Arch " + " ".join([f"| {n}" for n in names]) + " |")
    logger.info("|---" * (num_values + 1) + "|")
    if len(full_arch_name) > 15:
        full_arch_name = full_arch_name[:8] + "..."
    logger.info(
        f"| {full_arch_name} "
        + " ".join([f"| {v:.3f}" for v in values]) + " |")


def save_config_yaml(cfg, path: str):
    """Dump the effective config (reference utils.py:260-271)."""
    with open(path, "w") as f:
        f.write(cfg.dump_yaml())
