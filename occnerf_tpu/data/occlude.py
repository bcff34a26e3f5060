"""Object-cutout occlusion augmentation (host-side).

Behavioral equivalent of the reference's Pascal-VOC occluder compositor
(`core/data/occnerf/occlude.py:37-219`): cut non-person objects out of a
VOC-layout dataset using their segmentation masks, then alpha-paste random
occluders over training images.  Like the reference (where the import is
commented out — `core/data/occnerf/train.py:27-30`) this is a dormant
utility: synthetic occlusion in training comes from the mask-column zeroing
in the train dataset.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

import numpy as np
import cv2


def load_occluders(pascal_voc_root_path: str,
                   min_area: int = 500) -> List[np.ndarray]:
    """Collect RGBA occluder cutouts from a Pascal-VOC dataset.

    Scans the VOC annotation xmls for non-person, non-difficult objects,
    matches them to instance segmentation masks, and returns a list of
    (H, W, 4) uint8 cutouts eroded by one pixel to soften halo edges.
    """
    occluders: List[np.ndarray] = []
    ann_dir = os.path.join(pascal_voc_root_path, "Annotations")
    structuring_element = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (8, 8))

    for ann_name in sorted(os.listdir(ann_dir)):
        if not ann_name.endswith(".xml"):
            continue
        tree = ET.parse(os.path.join(ann_dir, ann_name))
        root = tree.getroot()
        if root.find("segmented") is None or \
                root.findtext("segmented", "0") == "0":
            continue

        boxes = []
        for obj in root.findall("object"):
            if obj.findtext("name") == "person":
                continue
            if obj.findtext("difficult", "0") != "0" or \
                    obj.findtext("truncated", "0") != "0":
                continue
            bb = obj.find("bndbox")
            boxes.append([int(bb.findtext(t)) for t in
                          ("xmin", "ymin", "xmax", "ymax")])
        if not boxes:
            continue

        im_name = root.findtext("filename")
        seg_name = im_name.replace("jpg", "png")
        im_path = os.path.join(pascal_voc_root_path, "JPEGImages", im_name)
        seg_path = os.path.join(pascal_voc_root_path, "SegmentationObject",
                                seg_name)
        if not (os.path.exists(im_path) and os.path.exists(seg_path)):
            continue
        im = np.asarray(cv2.cvtColor(cv2.imread(im_path), cv2.COLOR_BGR2RGB))
        labels = np.asarray(cv2.imread(seg_path))[:, :, 0]

        for i_obj, (xmin, ymin, xmax, ymax) in enumerate(boxes):
            object_mask = (labels[ymin:ymax, xmin:xmax] == i_obj + 1
                           ).astype(np.uint8) * 255
            object_image = im[ymin:ymax, xmin:xmax]
            if cv2.countNonZero(object_mask) < min_area:
                continue
            # soften the edge to reduce background-color halos
            eroded = cv2.erode(object_mask, structuring_element)
            object_with_mask = np.concatenate(
                [object_image, eroded[..., None]], axis=-1)
            occluders.append(object_with_mask)
    return occluders


def occlude_with_objects(im: np.ndarray, occluders: List[np.ndarray],
                         rng: Optional[np.random.Generator] = None,
                         count_range: Tuple[int, int] = (1, 8)) -> np.ndarray:
    """Paste random occluders at random scaled positions over ``im``."""
    rng = rng or np.random.default_rng()
    result = im.copy()
    width_height = np.asarray([im.shape[1], im.shape[0]])
    im_scale_factor = min(width_height) / 256.0
    count = int(rng.integers(count_range[0], count_range[1]))

    for _ in range(count):
        occluder = occluders[int(rng.integers(0, len(occluders)))]
        rescale = rng.uniform(0.2, 1.0) * im_scale_factor
        occluder = resize_by_factor(occluder, rescale)
        center = rng.uniform(0, width_height, size=2)
        paste_over(im_src=occluder, im_dst=result, center=center)
    return result


def occlude_at_joints(im: np.ndarray, occluders: List[np.ndarray],
                      multiplier: float, joints: np.ndarray,
                      mask: bool = True) -> np.ndarray:
    """The reference's ACTIVE ``occlude_with_objects`` semantics
    (`core/data/occnerf/occlude.py:95-152`): paste EVERY occluder in the
    list, resized by ``multiplier``, centered at ``joints`` (a single xy
    center), with ``mask=True`` whitening the occluder to ``255 - alpha``
    (the shipped mask-cutout mode).  CHW inputs are transposed to HWC;
    the returned image drops any alpha channel."""
    result = (im.copy().transpose(1, 2, 0)
              if im.shape[0] <= 3 else im.copy())
    for occluder in occluders:
        occluder = resize_by_factor(occluder, multiplier)
        paste_over(im_src=occluder, im_dst=result, center=joints,
                   mask=mask)
    return result[:, :, :3]


def paste_over(im_src: np.ndarray, im_dst: np.ndarray,
               center: np.ndarray, mask: bool = False) -> None:
    """Alpha-composite ``im_src`` (RGBA; RGB grows an alpha from channel
    0, `occlude.py:190-193`) onto ``im_dst`` in place, centered at
    ``center``, clipping at the borders.  ``mask=True`` replaces the
    occluder colors with ``255 - alpha`` (the reference's shipped
    whitened-cutout mode, `occlude.py:196-200`)."""
    im_src = im_src.copy()
    if im_src.shape[-1] == 3:
        im_src = np.concatenate((im_src, im_src[:, :, [0]]), axis=-1)
    if mask:
        im_src[:, :, :3] = im_src[:, :, [-1]]
        im_src[:, :, :3] = 255 - im_src[:, :, :3]
    wh_src = np.asarray([im_src.shape[1], im_src.shape[0]])
    wh_dst = np.asarray([im_dst.shape[1], im_dst.shape[0]])

    center = np.round(center).astype(np.int32)
    raw_start = center - wh_src // 2
    raw_end = raw_start + wh_src

    start = np.clip(raw_start, 0, wh_dst)
    end = np.clip(raw_end, 0, wh_dst)
    region_dst = im_dst[start[1]:end[1], start[0]:end[0]]

    start_src = start - raw_start
    end_src = wh_src + (end - raw_end)
    region_src = im_src[start_src[1]:end_src[1], start_src[0]:end_src[0]]
    if region_src.size == 0 or region_dst.size == 0:
        return
    alpha = (region_src[..., 3:].astype(np.float32) / 255.0)
    im_dst[start[1]:end[1], start[0]:end[0]] = (
        alpha * region_src[..., :3] + (1.0 - alpha) * region_dst
    ).astype(im_dst.dtype)


def resize_by_factor(im: np.ndarray, factor: float) -> np.ndarray:
    new_size = tuple(np.round(
        np.array([im.shape[1], im.shape[0]]) * factor).astype(int))
    new_size = (max(1, new_size[0]), max(1, new_size[1]))
    interp = cv2.INTER_LINEAR if factor > 1.0 else cv2.INTER_AREA
    return cv2.resize(im, new_size, fx=factor, fy=factor,
                      interpolation=interp)
