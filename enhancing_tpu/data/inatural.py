"""iNaturalist dataset (2017-2021 layouts), no auto-download (zero-egress env).

Parity with reference: enhancing/dataloader/inatural.py:24-277 (vendored
torchvision INaturalist with URL/MD5 download tables). This environment has no
network egress, so the download path is stubbed with a clear error; the
on-disk category layouts are supported:

- 2017/2018: root/<super>/<subdir per class>/**.jpg (category = class dir)
- 2019:     root/<categ_id>/*.jpg
- 2021:     root/<"id super name">/...
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .base import Dataset
from .classimage import IMG_EXTENSIONS
from .transforms import EvalTransform, TrainTransform, load_image

DOWNLOAD_URLS = {
    # kept for documentation parity with the reference's tables
    "2017": "https://ml-inat-competition-datasets.s3.amazonaws.com/2017/train_val_images.tar.gz",
    "2018": "https://ml-inat-competition-datasets.s3.amazonaws.com/2018/train_val2018.tar.gz",
    "2019": "https://ml-inat-competition-datasets.s3.amazonaws.com/2019/train_val2019.tar.gz",
    "2021_train": "https://ml-inat-competition-datasets.s3.amazonaws.com/2021/train.tar.gz",
    "2021_valid": "https://ml-inat-competition-datasets.s3.amazonaws.com/2021/val.tar.gz",
}


class INaturalistBase(Dataset):
    split = "train"
    train = True

    def __init__(self, root: str, version: str = "2021", resolution: int = 256,
                 download: bool = False) -> None:
        if download:
            raise RuntimeError(
                "Auto-download is unavailable in this zero-egress "
                f"environment; fetch {DOWNLOAD_URLS.get(version, version)} "
                "manually and extract under root.")
        self.root = Path(root)
        base = self.root / self.split if (self.root / self.split).is_dir() \
            else self.root
        cat_dirs = sorted(d for d in base.iterdir() if d.is_dir())
        self.categories = [d.name for d in cat_dirs]
        self.samples = []
        for ci, d in enumerate(cat_dirs):
            for p in sorted(d.glob("**/*")):
                if p.suffix.lower() in IMG_EXTENSIONS:
                    self.samples.append((str(p), ci))
        self.transform = (TrainTransform(resolution) if self.train
                          else EvalTransform(resolution))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, cls = self.samples[idx]
        return {"image": self.transform(load_image(path)),
                "class": np.int32(cls)}


class INaturalistTrain(INaturalistBase):
    split, train = "train", True


class INaturalistValidation(INaturalistBase):
    split, train = "val", False
