"""Image/GIF writing for previews and novel-view renders.

Mirrors the reference's artifacts: preview PNGs every N steps
(src/train.py:133-140), final.png (src/train.py:157-159), and
novel_views.gif at fps=15, loop=0 (src/make_gif.py:29-30).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def to_uint8(img) -> np.ndarray:
    """[0,1] float image -> uint8, matching (img * 255).astype(uint8).

    uint8 inputs pass through unchanged (renderers may quantize on
    device to shrink the device->host transfer 4x)."""
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        return arr
    return (np.clip(arr.astype(np.float32), 0.0, 1.0) * 255).astype(np.uint8)


def write_png(path: str, img) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.imwrite(path, to_uint8(img))


def write_gif(path: str, frames: Sequence, fps: int = 15, loop: int = 0) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # imageio's pillow plugin deprecated `fps` for GIFs; `duration` is
    # per-frame milliseconds (fps=15 -> ~67ms).
    imageio.mimsave(
        path, [to_uint8(f) for f in frames], duration=1000.0 / fps, loop=loop
    )
