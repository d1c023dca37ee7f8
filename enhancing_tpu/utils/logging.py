"""Image-grid logging utilities: local PNGs + optional wandb.

Parity with reference: enhancing/utils/callback.py:42-141 (ImageLogger) —
grids saved under <basedir>/log/results/<split>/ and pushed to wandb when the
package is available (gated; not installed in this image).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

try:
    import wandb  # type: ignore
    HAS_WANDB = True
except ImportError:
    wandb = None
    HAS_WANDB = False


def make_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """(B, H, W, C) float [0,1] -> single HWC uint8 grid image."""
    images = np.clip(np.asarray(images, np.float32), 0.0, 1.0)
    b, h, w, c = images.shape
    ncol = min(nrow, b)
    nrows = -(-b // ncol)
    grid = np.ones((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   np.float32)
    for i in range(b):
        r, cl = divmod(i, ncol)
        top = r * (h + pad) + pad
        left = cl * (w + pad) + pad
        grid[top:top + h, left:left + w] = images[i]
    return (grid * 255).astype(np.uint8)


def save_image_grid(images, path: str | Path, nrow: int = 4) -> None:
    from PIL import Image
    grid = make_grid(np.asarray(images), nrow)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid.squeeze() if grid.shape[-1] == 1 else grid).save(path)


class JsonlLogger:
    """Append-only ``metrics.jsonl`` in the run dir: one
    ``{"step": N, ...metrics}`` object per logged step. The zero-egress
    stand-in for wandb's scalar history — machine-readable loss/PSNR/
    code-perplexity trajectories for convergence artifacts."""

    def __init__(self, save_dir: str) -> None:
        self.path = Path(save_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        import json
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": int(step),
                                **{k: float(v) for k, v in metrics.items()}},
                               sort_keys=True) + "\n")

    def log_images(self, tag: str, images, step: int) -> None:
        pass  # grids go through the ImageLogger callback's local PNGs


class MultiLogger:
    """Fan out log calls to several metric loggers."""

    def __init__(self, *loggers) -> None:
        self.loggers = [lg for lg in loggers if lg is not None]

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_images(self, tag: str, images, step: int) -> None:
        for lg in self.loggers:
            lg.log_images(tag, images, step)


class WandbLogger:
    """Thin gated wandb wrapper (reference general.py:57)."""

    def __init__(self, save_dir: str, name: str, enabled: bool = True) -> None:
        self.enabled = enabled and HAS_WANDB
        if self.enabled:
            self.run = wandb.init(dir=save_dir, name=name, reinit=True)

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        if self.enabled:
            wandb.log(dict(metrics), step=step)

    def log_images(self, tag: str, images, step: int) -> None:
        if self.enabled:
            wandb.log({tag: [wandb.Image(make_grid(np.asarray(images)))]},
                      step=step)
