"""SDF environments and obstacle factors (reference: /root/reference/gpmp2/obstacle)."""

from .factors import (
    hinge_loss,
    obstacle_factor_error,
    obstacle_planar_factor_error,
    self_collision_error,
)
from .sdf import PlanarSDF, SignedDistanceField, planar_sdf_lookup, sdf_lookup

__all__ = [
    "PlanarSDF",
    "SignedDistanceField",
    "planar_sdf_lookup",
    "sdf_lookup",
    "hinge_loss",
    "obstacle_factor_error",
    "obstacle_planar_factor_error",
    "self_collision_error",
]
