from .exr import read_exr, write_exr
from .timing import Timing, TimedSection
