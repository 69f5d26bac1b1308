"""Texture factory — ``VTextureFactory`` parity
(``VR/Renderer/Public/TextureFactory.h:31-42``).

Creation + file loading for the texture kinds the reference exposes:
2D (WIC -> PNG here), 3D (volume payloads), cube maps (DDS).
"""

from __future__ import annotations

import numpy as np

from vrt.io.image import read_dds_cubemap, read_png


def create_texture_2d(width: int, height: int,
                      fill=(1.0, 1.0, 1.0)) -> np.ndarray:
    t = np.empty((height, width, 3), np.float32)
    t[:] = fill
    return t


def create_texture_3d(size: int, fill: float = 0.0) -> np.ndarray:
    return np.full((size, size, size), fill, np.float32)


def create_texture_cube(edge: int, fill=(0.0, 0.0, 0.0)) -> np.ndarray:
    t = np.empty((6, edge, edge, 3), np.float32)
    t[:] = fill
    return t


def load_texture_2d(path: str) -> np.ndarray:
    """PNG -> float32 [H,W,3] (the WIC path equivalent)."""
    img = read_png(path).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    return img[..., :3]


def load_texture_cube_from_file(path: str) -> np.ndarray:
    """DDS cube map -> float32 [6,E,E,3] (the DirectXTex path equivalent)."""
    return read_dds_cubemap(path)
