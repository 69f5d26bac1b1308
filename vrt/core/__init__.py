from vrt.core.grid import GridLaw  # noqa: F401
from vrt.core import quat  # noqa: F401
