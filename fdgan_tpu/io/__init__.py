from fdgan_tpu.io.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from fdgan_tpu.io import torch_import

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint", "torch_import"]
