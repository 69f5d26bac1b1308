from vrt.volume.volume import VoxelVolume  # noqa: F401
from vrt.volume import sdf  # noqa: F401
from vrt.volume import accel  # noqa: F401
