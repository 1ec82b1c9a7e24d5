from .bvh import build_bvh, FlatBVH
from .geometry import (
    MeshGeometry,
    DeviceScene,
    ProxyTable,
    concat_geometry,
    device_scene_from_meshes,
)
from .lights import LightTable, EnvironmentMap
from .partition import (
    partition_meshes,
    partition_instances,
    build_partitioned_scene,
    build_partitioned_scene_instanced,
    PartitionedScene,
)
from .procedural import city_scene, cornell_box, random_tri_soup, two_room_scene
