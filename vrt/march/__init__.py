from vrt.march.types import DeviceVolume, MarchHit, KIND_NONE, KIND_SURFACE  # noqa: F401
from vrt.march.march import march_volume  # noqa: F401
from vrt.march.resolve import resolve_hits, resolve_volume_hits  # noqa: F401
