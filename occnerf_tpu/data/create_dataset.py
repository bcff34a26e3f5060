"""Dataset / loader factories.

Same public surface as the reference (`core/data/create_dataset.py:27,59`):
``create_dataset(data_type, evaluate)`` resolves the Dataset class from
``cfg[data_type].dataset_module`` through the registry and applies the same
per-type argument customization (progress = 16 evenly-skipped train frames,
progress+evaluate = 300 frames, movement+evaluate disables occlusion).
"""

from __future__ import annotations

import os

from .. import registry
from ..config import cfg
from ..utils.files import list_files
from .dataset_args import DatasetArgs
from .loader import DataLoader


def _total_train_imgs(dataset_path: str) -> int:
    return len(list_files(os.path.join(dataset_path, "images"),
                          exts=[".png"]))


def create_dataset(data_type: str = "train", evaluate: bool = False):
    node = cfg[data_type]
    args = DatasetArgs.get(node.dataset)

    args["bgcolor"] = None if data_type == "train" else cfg.bgcolor
    if data_type == "progress" and not evaluate:
        total = _total_train_imgs(args["dataset_path"])
        args["skip"] = max(1, total // 16)
        args["maxframes"] = 16
    if data_type == "progress" and evaluate:
        args["maxframes"] = 300
    if data_type == "movement" and evaluate:
        cfg.occlude = False
        print("DISABLE OCCLUSION")

    dataset_cls = registry.resolve("dataset", node.dataset_module)
    return dataset_cls(**args)


def create_dataloader(data_type: str = "train", evaluate: bool = False
                      ) -> DataLoader:
    node = cfg[data_type]
    dataset = create_dataset(data_type=data_type, evaluate=evaluate)
    return DataLoader(
        dataset,
        batch_size=node.batch_size,
        shuffle=node.shuffle,
        drop_last=node.drop_last,
        num_workers=cfg.get("num_workers", 2),
        prefetch=cfg.get("tpu", {}).get("prefetch", 2) or 2,
    )
