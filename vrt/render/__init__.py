from vrt.render.gpuscene import GPUScene, RenderMode  # noqa: F401
from vrt.render.renderer import render_image, trace_radiance  # noqa: F401
from vrt.render.camera import camera_rays  # noqa: F401
