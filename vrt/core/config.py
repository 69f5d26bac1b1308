"""Config system — dataclass configs with JSON round-trip.

The reference has no runtime configuration (all compile-time constants,
SURVEY.md section 5); this is greenfield.  Configs cover the render
pipeline, fitting, and distribution, and serialize to/from JSON for CLI
``--config`` files.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class RenderConfig:
    width: int = 512
    height: int = 512
    mode: int = 0                 # EVRenderMode 0-7
    chunk_size: Optional[int] = None
    max_recursion_depth: int = 3  # informational; the pipeline cap is static


@dataclasses.dataclass
class FitConfig:
    resolution: int = 5
    views: int = 6
    image_size: int = 64
    steps: int = 200
    learning_rate: float = 1e-2
    fit_sdf: bool = True
    fit_colors: bool = True
    checkpoint_every: int = 0
    checkpoint_path: str = ""


@dataclasses.dataclass
class DistConfig:
    data_parallel: int = 0        # 0 = all devices
    model_parallel: int = 1
    shard_volumes: bool = False   # slab-shard volumes over 'model'


@dataclasses.dataclass
class Config:
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    fit: FitConfig = dataclasses.field(default_factory=FitConfig)
    dist: DistConfig = dataclasses.field(default_factory=DistConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)

        def build(dc, data):
            fields = {f.name: f for f in dataclasses.fields(dc)}
            kwargs = {}
            for k, v in (data or {}).items():
                if k not in fields:
                    raise ValueError(f"unknown config key: {k}")
                f = fields[k]
                if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
                    kwargs[k] = build(f.type, v)
                else:
                    kwargs[k] = v
            return dc(**kwargs)

        return cls(render=build(RenderConfig, raw.get("render")),
                   fit=build(FitConfig, raw.get("fit")),
                   dist=build(DistConfig, raw.get("dist")))

    @classmethod
    def load(cls, path: str) -> "Config":
        return cls.from_json(open(path).read())

    def save(self, path: str) -> None:
        open(path, "w").write(self.to_json())
