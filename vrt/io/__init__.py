from vrt.io.voxfile import load_scene, save_scene, load_archive, save_archive  # noqa: F401
