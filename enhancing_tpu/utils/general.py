"""General utilities: seeding + experiment callback assembly.

API-parity module for the reference's enhancing/utils/general.py — config
loading/instantiation live in utils/config.py; this adds ``set_seed`` and
``setup_callbacks`` (reference general.py:22-60).
"""
from __future__ import annotations

import random
from datetime import datetime
from pathlib import Path
from typing import List, Tuple

import numpy as np

from .callback import ImageLogger, SetupCallback
from .config import (  # re-exported for reference-API parity
    get_config_from_file,
    get_obj_from_str,
    initialize_from_config,
)
from .logging import WandbLogger


def set_seed(seed: int) -> None:
    """Seed host-side RNGs (jax PRNG keys are explicit, reference general.py:22-27)."""
    random.seed(seed)
    np.random.seed(seed)


def setup_callbacks(exp_config: dict, config: dict,
                    base_path: str = "experiments"
                    ) -> Tuple[List, WandbLogger, Path]:
    """Timestamped experiment dirs + standard callbacks
    (reference general.py:43-60). Returns (callbacks, logger, basedir)."""
    now = datetime.now().strftime("%d%m%Y_%H%M%S")
    basedir = Path(base_path) / exp_config["name"] / now
    basedir.mkdir(parents=True, exist_ok=True)

    setup_cb = SetupCallback(config, exp_config, basedir)
    logger = WandbLogger(str(basedir), f"{exp_config['name']}_{now}")
    image_cb = ImageLogger(exp_config.get("batch_frequency", 750),
                           exp_config.get("max_images", 4),
                           logdir=basedir / "log", wandb_logger=logger)
    return [setup_cb, image_cb], logger, basedir
