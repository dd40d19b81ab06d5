"""Data layer: ray generation, pose conventions, dataset providers (clean +
watermark/self-distillation) — equivalents of ``nerf/provider.py``,
``nerf/provider_wtmk.py`` and ``get_rays`` (``nerf/utils.py:54-139``)."""

from .rays import get_rays, nerf_matrix_to_ngp, rand_poses
from .provider import NeRFDataset
from .provider_wtmk import NeRFDatasetDisen
