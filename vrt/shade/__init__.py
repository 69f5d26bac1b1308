from vrt.shade import brdf, lights, texture  # noqa: F401
