"""Image IO helpers (host-side), mirroring `core/utils/image_util.py`."""

from __future__ import annotations

import os
import shutil
from typing import List, Optional

import numpy as np
from PIL import Image


def load_image(path: str, to_rgb: bool = True) -> Image.Image:
    img = Image.open(path)
    return img.convert("RGB") if to_rgb else img


def save_image(image_numpy: np.ndarray, image_path: str) -> None:
    Image.fromarray(image_numpy).save(image_path)


def to_8b_image(image: np.ndarray) -> np.ndarray:
    return (255.0 * np.clip(image, 0.0, 1.0)).astype(np.uint8)


def to_3ch_image(image: np.ndarray) -> np.ndarray:
    if image.ndim == 2:
        return np.stack([image] * 3, axis=-1)
    if image.ndim == 3 and image.shape[2] == 1:
        return np.concatenate([image] * 3, axis=-1)
    return image


def to_8b3ch_image(image: np.ndarray) -> np.ndarray:
    return to_3ch_image(to_8b_image(image))


def tile_images(images: List[np.ndarray], imgs_per_row: int = 4) -> np.ndarray:
    """Tile a list of equally-sized images into a grid, dropping a ragged
    final row (reference `image_util.py:38-50`)."""
    rows, row = [], []
    imgs_per_row = min(len(images), imgs_per_row)
    for img in images:
        row.append(img)
        if len(row) == imgs_per_row:
            rows.append(np.concatenate(row, axis=1))
            row = []
    if row and rows:
        pass  # drop incomplete final row, like the reference
    elif row:
        rows.append(np.concatenate(row, axis=1))
    return np.concatenate(rows, axis=0)


class ImageWriter:
    """Sequential png writer that recreates its output directory."""

    def __init__(self, output_dir: str, exp_name: str):
        self.image_dir = os.path.join(output_dir, exp_name)
        print(f"The rendering is saved in {self.image_dir}")
        if os.path.exists(self.image_dir):
            shutil.rmtree(self.image_dir)
        os.makedirs(self.image_dir, exist_ok=True)
        self.frame_idx = -1

    def append(self, image: np.ndarray, img_name: Optional[str] = None):
        self.frame_idx += 1
        if img_name is None:
            img_name = f"{self.frame_idx:06d}"
        save_image(image, os.path.join(self.image_dir, f"{img_name}.png"))
        return self.frame_idx, img_name

    def finalize(self) -> None:
        pass
