from vrt.scene.scene import (Scene, LevelObject, VoxelObject, Camera,  # noqa: F401
                             DirectionalLight, PointLight, SpotLight)
