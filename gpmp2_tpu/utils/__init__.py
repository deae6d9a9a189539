"""Utilities: file IO, timing, plotting (reference: gpmp2/utils + toolbox helpers)."""

from .fileio import (
    load_sdf,
    load_trajectory,
    read_sdf_vol_file,
    save_sdf,
    save_trajectory,
)
from .timer import Timer

__all__ = [
    "save_sdf", "load_sdf", "read_sdf_vol_file", "save_trajectory",
    "load_trajectory", "Timer",
]
