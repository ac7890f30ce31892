"""Logging setup — same surface as the reference
(``/root/reference/src/utils/custom_logging.py:11-81``): root logger with
timestamped file handler in ``paths.log_dir`` plus console handler, a system
inventory log (TPU devices instead of CUDA), and dataset-size /
class-distribution logging.

Note the reference ships broken: ``scripts/train.py:15`` imports
``src.utils.logging`` while the module on disk is ``custom_logging`` — this
package keeps the working name and imports it correctly.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime

import jax


def setup_logging(config) -> logging.Logger:
    """File + console handlers on the root logger; returns it."""
    log_dir = config["paths"]["log_dir"] if isinstance(config, dict) else (
        config.paths.log_dir
    )
    os.makedirs(log_dir, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = os.path.join(log_dir, f"training_{timestamp}.log")

    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(ch)
    root.info(f"Logging to {log_file}")
    return root


def log_system_info():
    """Device inventory (TPU-native analogue of the reference's CUDA log)."""
    logger = logging.getLogger(__name__)
    logger.info(f"JAX {jax.__version__}, backend: {jax.default_backend()}")
    logger.info(
        f"{jax.device_count()} device(s) across {jax.process_count()} process(es)"
    )
    for d in jax.devices():
        logger.info(f"  device {d.id}: {d.device_kind} ({d.platform})")


def log_dataset_info(train_dataset, val_dataset):
    logger = logging.getLogger(__name__)
    logger.info(f"Training samples: {len(train_dataset)}")
    logger.info(f"Validation samples: {len(val_dataset)}")
    logger.info(f"Diseases: {', '.join(train_dataset.disease_names)}")
