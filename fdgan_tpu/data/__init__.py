from fdgan_tpu.data.h5 import PairedH5Dataset, DataLoader, get_loader
from fdgan_tpu.data import transforms
from fdgan_tpu.data.folder import ImageFolder, ClassificationH5

__all__ = [
    "PairedH5Dataset",
    "DataLoader",
    "get_loader",
    "transforms",
    "ImageFolder",
    "ClassificationH5",
]
