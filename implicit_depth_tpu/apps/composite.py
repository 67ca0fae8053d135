"""AR compositing (parity: inference/composite.py).

Three matting modes (inference/composite.py:27-41, 96-134):
  mask   — predicted occlusion mattes (matte = 1 - mask * valid_virtual)
  depth  — soft depth-band matte between predicted real depth and the
           virtual depth (0.2 m band, :19-24)
  lidar  — same band matte against sensor depth
plus a fade-in and mp4 export (cv2; the reference shells to ffmpeg).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from implicit_depth_tpu.utils.visualization import write_video


def soft_depth_matte(real_depth: np.ndarray, virtual_depth: np.ndarray,
                     band: float = 0.2) -> np.ndarray:
    """Soft matte ~1 where the real surface is in front of the virtual one
    (inference/composite.py:19-24)."""
    diff = np.clip(virtual_depth - real_depth, 0.0, band) / band
    return np.where(virtual_depth > 0, diff, 0.0)


def composite_frame(
    image_hw3: np.ndarray,
    virtual_rgba_hw4: np.ndarray,
    mode: str = "mask",
    occlusion_matte: Optional[np.ndarray] = None,
    real_depth: Optional[np.ndarray] = None,
    virtual_depth: Optional[np.ndarray] = None,
    fade: float = 1.0,
) -> np.ndarray:
    """Alpha-blends a rendered virtual layer into the frame under the
    chosen occlusion model."""
    valid_virtual = virtual_rgba_hw4[..., 3]
    if mode == "mask":
        assert occlusion_matte is not None
        hide = occlusion_matte * (valid_virtual > 0)
    elif mode in ("depth", "lidar"):
        assert real_depth is not None and virtual_depth is not None
        hide = soft_depth_matte(real_depth, virtual_depth) * (valid_virtual > 0)
    else:
        raise ValueError(mode)

    alpha = valid_virtual * (1.0 - hide) * fade
    out = image_hw3 * (1.0 - alpha[..., None]) + virtual_rgba_hw4[..., :3] * alpha[..., None]
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def composite_sequence(
    images: list[np.ndarray],
    virtual_layers: list[np.ndarray],
    output_path: str,
    mode: str = "mask",
    mattes: Optional[list[np.ndarray]] = None,
    real_depths: Optional[list[np.ndarray]] = None,
    virtual_depths: Optional[list[np.ndarray]] = None,
    fade_in_frames: int = 10,
    fps: int = 30,
) -> None:
    frames = []
    for i, (img, virt) in enumerate(zip(images, virtual_layers)):
        fade = min(1.0, (i + 1) / max(fade_in_frames, 1))
        frames.append(composite_frame(
            img, virt, mode=mode,
            occlusion_matte=None if mattes is None else mattes[i],
            real_depth=None if real_depths is None else real_depths[i],
            virtual_depth=None if virtual_depths is None else virtual_depths[i],
            fade=fade,
        ))
    write_video(output_path, frames, fps=fps)
