"""Core field / ray ops (pure jnp + Pallas), the TPU-native equivalent of the
reference's CUDA extension (``raymarching/src/raymarching.cu``) and pure-torch
hash encoder (``hash_encoding.py``)."""

from .activation import trunc_exp
from .hashenc import (
    hash_coords,
    hash_encode,
    init_hash_table,
    level_resolutions,
)
from .sh import sh_encode
from .morton import morton3d, morton3d_invert
from .intersect import near_far_from_aabb, sph_from_ray
from .composite import composite_rays
from .pdf import sample_pdf
from .marching import march_rays
from .grid import (
    OccupancyGrid,
    init_occupancy_grid,
    update_occupancy_grid,
    mark_untrained_grid,
    packbits,
)
