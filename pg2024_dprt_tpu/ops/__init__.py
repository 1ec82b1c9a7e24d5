from .traversal import traverse_bvh, intersect_brute_force
from .compaction import compact_by_key, counts_per_key
