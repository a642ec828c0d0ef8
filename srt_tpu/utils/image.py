"""Image output: PPM (like the reference CPU renderer) and PNG via PIL.

The reference's CPU path writes gamma-corrected PPM
(src/raytracer/raytracer.cpp:10-25,59-61); ``write_ppm`` does the same for
float [H, W, 3] images (values already in display space, [0, 1])."""

from __future__ import annotations

import numpy as np


def to_uint8(img) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_ppm(path: str, img, flip_vertical: bool = True) -> None:
    """Write a binary P6 PPM.  ``flip_vertical`` converts our y-up row order
    to the top-down file order."""
    data = to_uint8(img)
    if flip_vertical:
        data = np.flipud(data)
    h, w = data.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(data.tobytes())


def write_png(path: str, img, flip_vertical: bool = True) -> bool:
    """Write a PNG if PIL is available; returns False otherwise."""
    try:
        from PIL import Image
    except ImportError:
        return False
    data = to_uint8(img)
    if flip_vertical:
        data = np.flipud(data)
    Image.fromarray(data).save(path)
    return True


def read_ppm(path: str) -> np.ndarray:
    """Read a binary P6 PPM to float [H, W, 3] in [0, 1] (file row order)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = map(int, line.split())
        maxval = int(f.readline())
        data = np.frombuffer(f.read(w * h * 3), np.uint8)
    return data.reshape(h, w, 3).astype(np.float32) / maxval
