from .rng import tea, rnd, rnd2, rnd3
from .types import PathState, HitRecord, NNQuery, BSDF_DIFFUSE, BSDF_WATER
from .camera import Camera
from .math import (
    normalize,
    cartesian_to_spherical,
    spherical_for_train,
    make_frame,
    to_world,
    to_local,
    uniform_hemisphere,
    uniform_sample_triangle,
    reflect_z,
    refract_z,
    dielectric_reflectance,
)
