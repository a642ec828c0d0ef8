"""Host-side texture atlas packing.

Replaces the reference's bindless texture manager
(include/asset_utils/gpu_texture.h): instead of per-texture GL handles made
resident on the driver, all ``map_Kd`` images are decoded once (PIL),
converted to linear float RGB, packed shelf-style into one atlas array, and
referenced by integer rects.  Images are ref-count-cached by path like the
reference's ``LoadedTextures`` map (gpu_texture.h:21-29).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Atlas:
    """Packed texture atlas: image [H, W, 3] float32 linear + rects [K, 4]
    int32 (x, y, w, h)."""

    image: np.ndarray
    rects: np.ndarray

    @property
    def num_textures(self) -> int:
        return self.rects.shape[0]


_image_cache: Dict[str, np.ndarray] = {}


def load_image(path: str) -> Optional[np.ndarray]:
    """Decode an image to float32 linear RGB [h, w, 3]; cached by path.

    Returns None when the file is missing or no decoder is available (the
    caller falls back to Kd, keeping the pipeline usable without PIL)."""
    if path in _image_cache:
        return _image_cache[path]
    try:
        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(path) as im:
            rgb = np.asarray(im.convert("RGB"), np.float32) / 255.0
    except OSError:
        return None
    # sRGB -> linear (the GL path sampled sRGB-decoded texels implicitly).
    linear = np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
    # OBJ UV v runs bottom-up; image rows run top-down.
    linear = np.flipud(linear).copy()
    _image_cache[path] = linear.astype(np.float32)
    return _image_cache[path]


def pack_atlas(images: Sequence[np.ndarray]) -> Atlas:
    """Shelf-pack images into one array (simple height-sorted shelves)."""
    if not images:
        return Atlas(image=np.zeros((1, 1, 3), np.float32),
                     rects=np.zeros((0, 4), np.int32))
    order = sorted(range(len(images)), key=lambda i: -images[i].shape[0])
    max_w = max(im.shape[1] for im in images)
    atlas_w = max(max_w, 1 << int(np.ceil(np.log2(max_w))))

    rects: List[Tuple[int, int, int, int]] = [None] * len(images)  # type: ignore
    shelf_y = 0
    shelf_h = 0
    x = 0
    placements = []
    for i in order:
        h, w = images[i].shape[:2]
        if x + w > atlas_w:
            shelf_y += shelf_h
            shelf_h = 0
            x = 0
        placements.append((i, x, shelf_y))
        rects[i] = (x, shelf_y, w, h)
        x += w
        shelf_h = max(shelf_h, h)
    atlas_h = shelf_y + shelf_h

    image = np.zeros((atlas_h, atlas_w, 3), np.float32)
    for i, px, py in placements:
        h, w = images[i].shape[:2]
        image[py:py + h, px:px + w] = images[i]
    return Atlas(image=image, rects=np.asarray(rects, np.int32))


def build_atlas_for_materials(materials) -> Tuple[Optional[Atlas], np.ndarray]:
    """Load every material's texture and pack an atlas.

    materials: sequence of MaterialDef.  Returns (atlas or None,
    tex_index [M] int32 with -1 for untextured/undecodable)."""
    images: List[np.ndarray] = []
    index = np.full(len(materials), -1, np.int32)
    seen: Dict[str, int] = {}
    for mi, m in enumerate(materials):
        if not getattr(m, "use_texture", False) or not m.texture_path:
            continue
        if m.texture_path in seen:
            index[mi] = seen[m.texture_path]
            continue
        img = load_image(m.texture_path)
        if img is None:
            continue
        seen[m.texture_path] = len(images)
        index[mi] = len(images)
        images.append(img)
    if not images:
        return None, index
    return pack_atlas(images), index
