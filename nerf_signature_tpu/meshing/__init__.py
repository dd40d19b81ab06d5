from .marching_cubes import marching_cubes
from .extract import extract_fields, extract_geometry, save_mesh
