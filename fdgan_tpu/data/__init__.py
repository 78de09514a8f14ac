from fdgan_tpu.data.h5 import PairedH5Dataset, DataLoader, get_loader
from fdgan_tpu.data import transforms

__all__ = ["PairedH5Dataset", "DataLoader", "get_loader", "transforms"]
