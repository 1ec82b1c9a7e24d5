from .bvh import build_bvh, FlatBVH
from .geometry import (
    MeshGeometry,
    DeviceScene,
    ProxyTable,
    concat_geometry,
    device_scene_from_meshes,
)
from .lights import LightTable, EnvironmentMap
from .partition import partition_meshes, build_partitioned_scene, PartitionedScene
from .procedural import city_scene, cornell_box, random_tri_soup, two_room_scene
