from .mesh import NODES_AXIS, make_mesh
from .exchange import exchange_paths, ring_shadow_occlusion
from .distributed import render_sample_distributed, render_image_distributed
