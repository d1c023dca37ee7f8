"""Generic ImageFolder dataset: root/<split>/<class_name>/<image files>.

Parity with reference: enhancing/dataloader/classimage.py:19-60 (which wraps
torchvision ImageFolder). Returns {'image': float HWC, 'class': int}.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .base import Dataset
from .transforms import EvalTransform, TrainTransform, load_image

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                  ".tiff", ".webp")


def scan_image_folder(root: Path) -> Tuple[List[Tuple[str, int]], List[str]]:
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    class_to_idx = {c: i for i, c in enumerate(classes)}
    samples = []
    for c in classes:
        for dirpath, _, files in os.walk(root / c):
            for f in sorted(files):
                if f.lower().endswith(IMG_EXTENSIONS):
                    samples.append((str(Path(dirpath) / f), class_to_idx[c]))
    return samples, classes


class ClassImageBase(Dataset):
    split = "train"
    train = True

    def __init__(self, root: str, resolution: int = 256,
                 split: Optional[str] = None) -> None:
        self.root = Path(root)
        split = split or self.split
        folder = self.root / split if (self.root / split).is_dir() else self.root
        self.samples, self.classes = scan_image_folder(folder)
        self.transform = (TrainTransform(resolution) if self.train
                          else EvalTransform(resolution))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, cls = self.samples[idx]
        img = self.transform(load_image(path))
        return {"image": img, "class": np.int32(cls)}


class ClassImageTrain(ClassImageBase):
    split, train = "train", True


class ClassImageValidation(ClassImageBase):
    split, train = "val", False
