"""Data pipeline: datasets, loaders, ray sampling (host-side numpy)."""

from .create_dataset import create_dataset, create_dataloader
from .dataset_args import DatasetArgs
from .loader import DataLoader
from .rays import unpack_to_image

__all__ = ["create_dataset", "create_dataloader", "DatasetArgs",
           "DataLoader", "unpack_to_image"]
