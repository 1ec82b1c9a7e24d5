from .config import RenderConfig
from .pathgen import generate_camera_paths
from .shade import shade, surface_attributes
from .engine import Renderer, render_image
