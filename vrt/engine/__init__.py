from vrt.engine.engine import Engine, EngineInstance  # noqa: F401
