"""Signed distance fields as device arrays with differentiable lookups.

TPU-native port of /root/reference/gpmp2/obstacle/PlanarSDF.h (2D, bilinear)
and SignedDistanceField.h (3D, trilinear). Semantics preserved exactly:

  - data layout: 2D field is (rows, cols) = (Y, X); 3D field is
    (z_slices, rows, cols) = (Z, Y, X) — the reference stores a vector of
    z-slice matrices (SignedDistanceField.h:44), here one 3D array.
  - world -> cell: col = (x - ox)/cell, row = (y - oy)/cell, z likewise
    (PlanarSDF.h:103-116, SignedDistanceField.h:103-116).
  - interpolation: bi/tri-linear over the floor cell corner
    (PlanarSDF.h:92-102, SignedDistanceField.h:127-141).
  - gradient: analytic gradient OF THE INTERPOLANT (piecewise-constant per
    cell in each axis), returned in world units (divided by cell_size), with
    (x, y[, z]) component ordering (PlanarSDF.h:78-83, SDF.h:92-97).
  - out-of-range queries: the reference throws SDFQueryOutOfRange, which
    hingeLossObstacleCost converts to cost 0 / gradient 0
    (/root/reference/gpmp2/obstacle/ObstacleCost.h:31-38). XLA cannot throw,
    so lookups also return an `in_range` mask and the hinge loss applies the
    zero-cost clamp with `where`.

Both field types are NamedTuple pytrees -> they vmap/shard and live in HBM;
a batch axis on `data` gives per-problem worlds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["PlanarSDF", "SignedDistanceField", "planar_sdf_lookup", "sdf_lookup"]


class PlanarSDF(NamedTuple):
    """2D signed distance field. data is (rows, cols) = (Y, X), meters."""

    origin: jnp.ndarray  # (2,) world coords of cell (0, 0)
    cell_size: jnp.ndarray  # scalar
    data: jnp.ndarray  # (rows, cols)


class SignedDistanceField(NamedTuple):
    """3D signed distance field. data is (Z, Y, X), meters."""

    origin: jnp.ndarray  # (3,)
    cell_size: jnp.ndarray  # scalar
    data: jnp.ndarray  # (z, rows, cols)


def _clip_idx(i, n):
    return jnp.clip(i, 0, n - 1)


def planar_sdf_lookup(sdf: PlanarSDF, point):
    """Bilinear signed distance + world-frame gradient + in-range mask.

    point: (..., 2) world (x, y). Returns (dist, grad(...,2), in_range).
    Matches PlanarSDF::getSignedDistance(point, g) including the gradient of
    the bilinear interpolant (PlanarSDF.h:106-118).
    """
    point = jnp.asarray(point)
    rows, cols = sdf.data.shape[-2], sdf.data.shape[-1]
    cs = sdf.cell_size
    x = (point[..., 0] - sdf.origin[0]) / cs  # col coordinate
    y = (point[..., 1] - sdf.origin[1]) / cs  # row coordinate

    in_range = (
        (x >= 0.0) & (x <= cols - 1.0) & (y >= 0.0) & (y <= rows - 1.0)
    )

    # clamp so gathers stay in-bounds; results are masked by in_range anyway
    xc = jnp.clip(x, 0.0, cols - 1.0)
    yc = jnp.clip(y, 0.0, rows - 1.0)
    lc = jnp.floor(xc)
    lr = jnp.floor(yc)
    lci = _clip_idx(lc.astype(jnp.int32), cols)
    lri = _clip_idx(lr.astype(jnp.int32), rows)
    hci = _clip_idx(lci + 1, cols)
    hri = _clip_idx(lri + 1, rows)

    fx = xc - lc  # in [0, 1)
    fy = yc - lr

    # fused 4-corner gather from the flattened field (see the 3D variant
    # for the boundary-safety argument)
    flat = sdf.data.reshape(-1)
    base = lri * cols + lci
    corner_offs = jnp.asarray([0, cols, 1, cols + 1], jnp.int32)
    vals = jnp.take(flat, base[..., None] + corner_offs)
    d00, d10, d01, d11 = (
        vals[..., 0], vals[..., 1], vals[..., 2], vals[..., 3],
    )

    dist = (
        (1.0 - fy) * (1.0 - fx) * d00
        + fy * (1.0 - fx) * d10
        + (1.0 - fy) * fx * d01
        + fy * fx * d11
    )
    # gradient wrt cell index, then to world units; order (x, y)
    g_row = (1.0 - fx) * (d10 - d00) + fx * (d11 - d01)
    g_col = (1.0 - fy) * (d01 - d00) + fy * (d11 - d10)
    grad = jnp.stack([g_col, g_row], axis=-1) / cs
    return dist, grad, in_range


def sdf_lookup(sdf: SignedDistanceField, point):
    """Trilinear signed distance + world gradient + in-range mask.

    point: (..., 3) world (x, y, z). Matches
    SignedDistanceField::getSignedDistance(point, g) (SDF.h:92-167).
    """
    point = jnp.asarray(point)
    nz, rows, cols = sdf.data.shape[-3], sdf.data.shape[-2], sdf.data.shape[-1]
    cs = sdf.cell_size
    x = (point[..., 0] - sdf.origin[0]) / cs
    y = (point[..., 1] - sdf.origin[1]) / cs
    z = (point[..., 2] - sdf.origin[2]) / cs

    in_range = (
        (x >= 0.0)
        & (x <= cols - 1.0)
        & (y >= 0.0)
        & (y <= rows - 1.0)
        & (z >= 0.0)
        & (z <= nz - 1.0)
    )

    xc = jnp.clip(x, 0.0, cols - 1.0)
    yc = jnp.clip(y, 0.0, rows - 1.0)
    zc = jnp.clip(z, 0.0, nz - 1.0)
    lc, lr, lz = jnp.floor(xc), jnp.floor(yc), jnp.floor(zc)
    lci = _clip_idx(lc.astype(jnp.int32), cols)
    lri = _clip_idx(lr.astype(jnp.int32), rows)
    lzi = _clip_idx(lz.astype(jnp.int32), nz)
    hci = _clip_idx(lci + 1, cols)
    hri = _clip_idx(lri + 1, rows)
    hzi = _clip_idx(lzi + 1, nz)

    fx, fy, fz = xc - lc, yc - lr, zc - lz

    # One fused gather of all 8 cell corners from the flattened field: a
    # single 1-D take lowers to a far cheaper TPU gather than 8 multi-dim
    # advanced-indexing gathers. Corner offsets use the clamped low corner
    # as base; +1 offsets may point one past a boundary row only when the
    # matching interpolation weight is exactly zero (coordinates are
    # clamped so fx/fy/fz = 0 there), and jnp.take clips out-of-range
    # linear indices, so the reads are safe and the masked values unused.
    flat = sdf.data.reshape(-1)
    base = (lzi * rows + lri) * cols + lci
    corner_offs = jnp.asarray(
        [0, cols, 1, cols + 1,
         rows * cols, rows * cols + cols, rows * cols + 1,
         rows * cols + cols + 1],
        jnp.int32,
    )
    vals = jnp.take(flat, base[..., None] + corner_offs)  # (..., 8)
    d000, d010, d001, d011, d100, d110, d101, d111 = (
        vals[..., 0], vals[..., 1], vals[..., 2], vals[..., 3],
        vals[..., 4], vals[..., 5], vals[..., 6], vals[..., 7],
    )

    w000 = (1 - fy) * (1 - fx) * (1 - fz)
    w010 = fy * (1 - fx) * (1 - fz)
    w001 = (1 - fy) * fx * (1 - fz)
    w011 = fy * fx * (1 - fz)
    w100 = (1 - fy) * (1 - fx) * fz
    w110 = fy * (1 - fx) * fz
    w101 = (1 - fy) * fx * fz
    w111 = fy * fx * fz

    dist = (
        w000 * d000 + w010 * d010 + w001 * d001 + w011 * d011
        + w100 * d100 + w110 * d110 + w101 * d101 + w111 * d111
    )

    # gradient of the trilinear interpolant (SDF.h:146-167), world units
    g_row = (
        (1 - fx) * (1 - fz) * (d010 - d000)
        + fx * (1 - fz) * (d011 - d001)
        + (1 - fx) * fz * (d110 - d100)
        + fx * fz * (d111 - d101)
    )
    g_col = (
        (1 - fy) * (1 - fz) * (d001 - d000)
        + fy * (1 - fz) * (d011 - d010)
        + (1 - fy) * fz * (d101 - d100)
        + fy * fz * (d111 - d110)
    )
    g_z = (
        (1 - fy) * (1 - fx) * (d100 - d000)
        + fy * (1 - fx) * (d110 - d010)
        + (1 - fy) * fx * (d101 - d001)
        + fy * fx * (d111 - d011)
    )
    grad = jnp.stack([g_col, g_row, g_z], axis=-1) / cs
    return dist, grad, in_range
