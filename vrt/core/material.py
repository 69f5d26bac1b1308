"""Material description (``VMaterial``, ``VR/Core/Public/Material.h:22-42``).

Defaults match the reference: 0.8 gray albedo, roughness 0.8, metallic 0,
texture tiling (100, 100) (``Material.h:25-33``).  The specular ``k``
parameter uploaded to the shader is ``(roughness + 1)^2 / 8``
(``VR/Renderer/DX/Private/RDXVoxelVolume.cpp:383``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass
class Material:
    albedo: Tuple[float, float, float, float] = (0.8, 0.8, 0.8, 1.0)
    roughness: float = 0.8
    metallic: float = 0.0
    albedo_texture: str = ""
    normal_texture: str = ""
    rm_texture: str = ""
    texture_scale: Tuple[float, float] = (100.0, 100.0)

    @property
    def k(self) -> float:
        r = self.roughness + 1.0
        return (r * r) / 8.0
