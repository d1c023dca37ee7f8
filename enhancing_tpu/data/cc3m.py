"""Conceptual Captions (CC3M) dataset: <split>_list.txt of (image, caption).

Parity of intent with reference: enhancing/dataloader/cc3m.py:17-70 — the
reference implementation is broken (uninitialized ``self.items``, undefined
base class; SURVEY §2.7); this implements what it evidently meant: a TSV list
of image-path/caption pairs under ``root``.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from .base import Dataset
from .transforms import EvalTransform, TrainTransform, load_image


class CC3MBase(Dataset):
    split = "train"
    train = True

    def __init__(self, root: str, resolution: int = 256,
                 tokenizer: Optional[dict] = None, text_len: int = 77,
                 truncate_captions: bool = True) -> None:
        from ..utils.config import initialize_from_config
        from ..utils.tokenizer import SimpleTokenizer
        self.root = Path(root)
        self.tokenizer = (initialize_from_config(tokenizer) if tokenizer
                          else SimpleTokenizer())
        self.text_len = text_len
        self.truncate_captions = truncate_captions

        list_file = self.root / f"{self.split}_list.txt"
        self.items = []
        with open(list_file) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                img_path, text = line.split("\t", 1)
                self.items.append((img_path, text))
        self.transform = (TrainTransform(resolution) if self.train
                          else EvalTransform(resolution))

    def __len__(self) -> int:
        return len(self.items)

    def _skip_sample(self, idx: int):
        return self[(idx + 1) % len(self)]

    def __getitem__(self, idx: int):
        img_path, text = self.items[idx]
        try:
            img = self.transform(load_image(str(self.root / img_path)))
        except (OSError, ValueError):
            return self._skip_sample(idx)
        tokens = self.tokenizer.tokenize(text, self.text_len,
                                         truncate_text=self.truncate_captions)
        return {"image": img, "caption": np.asarray(tokens, np.int32)}


class CC3MTrain(CC3MBase):
    split, train = "train", True


class CC3MValidation(CC3MBase):
    split, train = "val", False
