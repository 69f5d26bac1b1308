"""Texture atlas assembly from material texture paths.

The DX backend loads geometry textures on demand and caches them by path
(``VRDXScene::SyncGeometryTextures`` + cache, ``RDXScene.cpp:877-926``).
The TPU equivalent assembles one stacked, padded atlas [T,TH,TW,3] plus
per-volume (albedo, normal, rm) slot ids; slots 0/1 are the default white /
flat-normal textures (``RDXScene.cpp:241-272``).

Formats: PNG (``vrt.io.image.read_png``); DDS cube maps are environment-
only and load via ``read_dds_cubemap``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

DEFAULT_WHITE = 0
DEFAULT_NORMAL = 1


def _load_texture(path: str) -> np.ndarray | None:
    if not path:
        return None
    if not os.path.exists(path):
        return None
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".png":
            from vrt.io.image import read_png

            img = read_png(path).astype(np.float32) / 255.0
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            return img[..., :3]
        if ext == ".ppm":
            raw = open(path, "rb").read().split(b"\n", 3)
            w, h = map(int, raw[1].split())
            return np.frombuffer(raw[3], np.uint8).reshape(
                h, w, 3).astype(np.float32) / 255.0
    except Exception:
        return None
    return None


def build_texture_atlas(materials: Sequence) -> Tuple[np.ndarray, np.ndarray,
                                                      List[Tuple[int, int, int]]]:
    """materials: per-volume ``Material``s.  Returns (atlas [T,TH,TW,3],
    sizes i32 [T,2], per-volume (albedo,normal,rm) ids)."""
    textures: List[np.ndarray] = [np.ones((1, 1, 3), np.float32),
                                  np.asarray([[[0.5, 0.5, 1.0]]], np.float32)]
    cache: Dict[str, int] = {}

    def slot(path: str, default: int) -> int:
        if not path:
            return default
        if path in cache:
            return cache[path]
        img = _load_texture(path)
        if img is None:
            return default
        textures.append(img)
        cache[path] = len(textures) - 1
        return cache[path]

    ids = []
    for m in materials:
        ids.append((slot(m.albedo_texture, DEFAULT_WHITE),
                    slot(m.normal_texture, DEFAULT_NORMAL),
                    slot(m.rm_texture, DEFAULT_WHITE)))

    th = max(t.shape[0] for t in textures)
    tw = max(t.shape[1] for t in textures)
    atlas = np.zeros((len(textures), th, tw, 3), np.float32)
    sizes = np.zeros((len(textures), 2), np.int32)
    for i, t in enumerate(textures):
        atlas[i, :t.shape[0], :t.shape[1]] = t
        sizes[i] = (t.shape[0], t.shape[1])
    return atlas, sizes, ids
