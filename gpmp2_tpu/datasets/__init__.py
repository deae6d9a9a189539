"""Dataset generators + SDF construction (reference: matlab/+gpmp2, gpmp2_python/datasets+utils)."""

from .generate2d import Dataset2D, add_obstacle_2d, generate_2d_dataset
from .generate3d import Dataset3D, add_obstacle_3d, generate_3d_dataset
from .sdf_gen import (
    dataset_screen_boxes,
    planar_sdf_from_occupancy,
    sdf_from_occupancy,
    signed_distance_field_2d,
    signed_distance_field_3d,
)

__all__ = [
    "Dataset2D", "Dataset3D", "generate_2d_dataset", "generate_3d_dataset",
    "add_obstacle_2d", "add_obstacle_3d", "signed_distance_field_2d",
    "signed_distance_field_3d", "planar_sdf_from_occupancy",
    "sdf_from_occupancy", "dataset_screen_boxes",
]
