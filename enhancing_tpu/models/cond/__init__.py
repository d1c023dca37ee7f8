from .dummycond import ClassCond, DummyCond, TextCond
from .vqcond import VQCond, VQSegmentation

__all__ = ["DummyCond", "TextCond", "ClassCond", "VQCond", "VQSegmentation"]
