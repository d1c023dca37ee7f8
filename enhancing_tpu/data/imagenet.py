"""ImageNet dataset: standard ILSVRC2012 folder layout.

Parity with reference: enhancing/dataloader/imagenet.py:15-54 (torchvision
ImageNet wrapper). Works on the extracted layout root/{train,val}/<wnid>/*.JPEG
— no torchvision/devkit dependency. Returns {'image', 'class'}.
"""
from __future__ import annotations

from .classimage import ClassImageBase


class ImageNetBase(ClassImageBase):
    pass


class ImageNetTrain(ImageNetBase):
    split, train = "train", True


class ImageNetValidation(ImageNetBase):
    split, train = "val", False
