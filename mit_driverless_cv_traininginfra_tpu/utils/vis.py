"""Visualization utilities (reference ``RektNet/utils.py:41-71,113-150`` and
``CVC-YOLOv3/utils/utils.py:301-312``): keypoint/heatmap/box renderers used
by the detect CLIs and the ``--vis_batch``/``--vis_dataloader`` debug
harnesses. Writes via a temp name then renames, like the reference."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image, ImageDraw

KPT_COLORS = [(0, 255, 0), (255, 0, 0), (255, 255, 0), (0, 255, 255),
              (255, 0, 255), (127, 255, 127), (255, 127, 127)]


def visualize_and_save_to_local(img: Image.Image, labels, tmp_path: str,
                                box_color: str = "red"):
    """Draw (N,5) [c,x1,y1,x2,y2] boxes on a PIL image and save
    (utils/utils.py:301-312)."""
    if labels is not None:
        draw = ImageDraw.Draw(img)
        for row in np.asarray(labels):
            draw.rectangle((float(row[1]), float(row[2]), float(row[3]),
                            float(row[4])), outline=box_color)
    os.makedirs(os.path.dirname(tmp_path) or ".", exist_ok=True)
    img.save(tmp_path)


def vis_kpt_and_save(np_image, image_name: str, labels,
                     color=(52, 31, 163), output_uri: str = "outputs/visualization"):
    """Draw keypoints (pixel coords) on an image (RektNet/utils.py:41-48)."""
    for pt in np.asarray(labels):
        cv2.circle(np_image, (int(pt[0]), int(pt[1])), 3, color, -1)
    os.makedirs(output_uri, exist_ok=True)
    dest = os.path.join(output_uri, image_name + "_label_vis.jpg")
    if not cv2.imwrite(dest + ".tmp.jpg", np_image):
        raise Exception("Could not write image")
    os.rename(dest + ".tmp.jpg", dest)
    return dest


def vis_hm_and_save(np_heat_map, image_name: str,
                    output_uri: str = "outputs/visualization"):
    """Sum the per-keypoint heatmaps into one normalised image
    (RektNet/utils.py:50-59)."""
    summed = np.asarray(np_heat_map, np.float64).sum(axis=0)
    lo, hi = summed.min(), summed.max()
    img = Image.fromarray(((summed - lo) * 255.0 / max(hi - lo, 1e-12)).astype(np.uint8))
    os.makedirs(output_uri, exist_ok=True)
    dest = os.path.join(output_uri, image_name + "_heat_map.jpg")
    img.save(dest)
    return dest


def vis_tensor_and_save(image, h: int, w: int, tensor_output, image_name: str,
                        output_uri: str):
    """Draw normalised keypoints scaled to the original image
    (RektNet/utils.py:61-71)."""
    for i, pt in enumerate(np.asarray(tensor_output)):
        cv2.circle(image, (int(pt[0] * w), int(pt[1] * h)), 2,
                   KPT_COLORS[i % len(KPT_COLORS)], -1)
    os.makedirs(output_uri, exist_ok=True)
    dest = os.path.join(output_uri, image_name + "_inference.jpg")
    if not cv2.imwrite(dest, image):
        raise Exception("Could not write image")
    return image
