"""Checkpointing / file IO for SDFs and trajectories.

Replaces the reference's Boost-serialization save/load
(SignedDistanceField::saveSDF/loadSDF, SignedDistanceField.cpp:13-70) with
npz archives, and ports the `.vol` file reader (fileUtils.cpp:16-60).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..obstacle.sdf import PlanarSDF, SignedDistanceField
from ..planner.problem import Trajectory

__all__ = [
    "save_sdf", "load_sdf", "read_sdf_vol_file", "save_trajectory",
    "load_trajectory",
]


def save_sdf(path: str, sdf) -> None:
    """Save a PlanarSDF or SignedDistanceField to an .npz archive
    (replaces saveSDF, gpmp2.h:454-455 / SaveSDFExample.m)."""
    kind = "planar" if isinstance(sdf, PlanarSDF) else "3d"
    np.savez_compressed(
        path,
        kind=kind,
        origin=np.asarray(sdf.origin),
        cell_size=np.asarray(sdf.cell_size),
        data=np.asarray(sdf.data),
    )


def load_sdf(path: str, dtype=jnp.float32):
    """Load an .npz SDF saved by save_sdf."""
    with np.load(path, allow_pickle=False) as z:
        kind = str(z["kind"])
        origin = jnp.asarray(z["origin"], dtype)
        cell = jnp.asarray(z["cell_size"], dtype)
        data = jnp.asarray(z["data"], dtype)
    cls = PlanarSDF if kind == "planar" else SignedDistanceField
    return cls(origin=origin, cell_size=cell, data=data)


def read_sdf_vol_file(filename_pre: str, dtype=jnp.float32) -> SignedDistanceField:
    """Read the reference's `.vol.head`/`.vol.data` format
    (fileUtils.cpp:16-60): head holds cols rows z / origin / resolution;
    data is x-major doubles filling [z][y][x]."""
    with open(filename_pre + ".vol.head") as f:
        tokens = f.read().split()
    cols, rows, nz = int(tokens[0]), int(tokens[1]), int(tokens[2])
    origin = np.asarray([float(tokens[3]), float(tokens[4]), float(tokens[5])])
    res = float(tokens[6])

    data_flat = np.loadtxt(filename_pre + ".vol.data").reshape(-1)
    if data_flat.size != cols * rows * nz:
        raise ValueError("vol data size mismatch")
    # file order: for x (cols): for y (rows): for z — i.e. (X, Y, Z)
    vol_xyz = data_flat.reshape(cols, rows, nz)
    data_zyx = np.transpose(vol_xyz, (2, 1, 0))
    return SignedDistanceField(
        origin=jnp.asarray(origin, dtype),
        cell_size=jnp.asarray(res, dtype),
        data=jnp.asarray(data_zyx, dtype),
    )


def save_trajectory(path: str, traj: Trajectory) -> None:
    """Checkpoint a (possibly batched) trajectory."""
    np.savez_compressed(path, pose=np.asarray(traj.pose), vel=np.asarray(traj.vel))


def load_trajectory(path: str, dtype=jnp.float32) -> Trajectory:
    with np.load(path, allow_pickle=False) as z:
        return Trajectory(jnp.asarray(z["pose"], dtype), jnp.asarray(z["vel"], dtype))
