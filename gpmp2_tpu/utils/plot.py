"""Matplotlib visualization helpers.

Port of the reference toolbox plotting (matlab/+gpmp2/plot*.m and
gpmp2_python/utils/plot_utils.py): evidence maps, signed distance fields,
planar arms / point robots / mobile bases, sphere robot models, 3D worlds.
All functions take a matplotlib Axes and numpy-convertible arrays.
"""

from __future__ import annotations

import numpy as np

from ..kinematics.fk import link_poses
from ..kinematics.robot import RobotModel, sphere_centers_world

__all__ = [
    "plot_evidence_map_2d",
    "plot_signed_distance_field_2d",
    "plot_signed_distance_field_3d",
    "plot_arm",
    "plot_planar_arm",
    "plot_planar_mobile_arm",
    "plot_planar_mobile_2arms",
    "plot_point_robot_2d",
    "plot_planar_mobile_base",
    "plot_robot_model_2d",
    "plot_map_3d",
    "plot_robot_model_3d",
    "set_3d_plot_range",
]


def plot_evidence_map_2d(ax, occupancy, origin_x, origin_y, cell_size):
    """Occupancy map as grayscale (plotEvidenceMap2D.m)."""
    occ = np.asarray(occupancy)
    rows, cols = occ.shape
    extent = [
        origin_x - cell_size / 2, origin_x + (cols - 0.5) * cell_size,
        origin_y - cell_size / 2, origin_y + (rows - 0.5) * cell_size,
    ]
    ax.imshow(1 - occ, cmap="gray", origin="lower", extent=extent, vmin=0, vmax=1)
    ax.set_xlabel("x")
    ax.set_ylabel("y")


def plot_signed_distance_field_2d(ax, field, origin_x, origin_y, cell_size):
    """SDF heatmap with zero contour (plotSignedDistanceField2D.m)."""
    f = np.asarray(field)
    rows, cols = f.shape
    extent = [
        origin_x - cell_size / 2, origin_x + (cols - 0.5) * cell_size,
        origin_y - cell_size / 2, origin_y + (rows - 0.5) * cell_size,
    ]
    im = ax.imshow(f, origin="lower", extent=extent, cmap="RdBu")
    xs = origin_x + cell_size * np.arange(cols)
    ys = origin_y + cell_size * np.arange(rows)
    ax.contour(xs, ys, f, levels=[0.0], colors="k", linewidths=1.0)
    return im


def plot_planar_arm(ax, fk, q, color="b", width=2):
    """Links of a planar arm as segments (plotPlanarArm.m)."""
    poses = link_poses(fk, np.asarray(q))
    pts = np.concatenate([np.zeros((1, 3)), np.asarray(poses.trans)], axis=0)
    # include base offset if the arm has a base pose
    if hasattr(fk, "base_trans"):
        pts[0] = np.asarray(fk.base_trans)
    ax.plot(pts[:, 0], pts[:, 1], "-o", color=color, linewidth=width,
            markersize=3)


def plot_signed_distance_field_3d(ax, field, origin, cell_size,
                                  epsilon_dist=0.0, marker_size=8):
    """Scatter the cells within `epsilon_dist` of an obstacle surface
    (plotSignedDistanceField3D.m: marks field < epsilon_dist, strict)."""
    f = np.asarray(field)  # (Z, Y, X)
    origin = np.asarray(origin)
    z, y, x = np.nonzero(f < epsilon_dist)
    xs = origin[0] + cell_size * x
    ys = origin[1] + cell_size * y
    zs = origin[2] + cell_size * z
    ax.scatter(xs, ys, zs, s=marker_size, c="r", alpha=0.2, marker=".")


def plot_arm(ax, fk, q, color="b", width=2):
    """3D arm skeleton: base -> each link origin as segments (plotArm.m)."""
    poses = link_poses(fk, np.asarray(q))
    pts = np.concatenate([np.zeros((1, 3)), np.asarray(poses.trans)], axis=0)
    if hasattr(fk, "base_trans"):
        pts[0] = np.asarray(fk.base_trans)
    ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "-o", color=color,
            linewidth=width, markersize=3)


def plot_planar_mobile_arm(ax, robot: RobotModel, pose, size=(0.4, 0.2),
                           color="b"):
    """SE(2) base rectangle + arm segments from the link frames
    (plotPlanarMobileArm.m). `pose` is the Pose2Vector storage
    [x, y, theta, q...]."""
    p = np.asarray(pose)
    plot_planar_mobile_base(ax, p[:3], size=size, color=color)
    poses = link_poses(robot.fk, p)
    # link 0 is the base frame; arm links follow (Pose2MobileArm.cpp:72-90)
    pts = np.asarray(poses.trans)
    ax.plot(pts[:, 0], pts[:, 1], "-o", color=color, markersize=3)


def plot_planar_mobile_2arms(ax, robot: RobotModel, pose, nr_links=(2, 2),
                             size=(0.4, 0.2), color="b"):
    """Base + two arm chains (plotPlanarMobile2Arms.m). `nr_links` gives
    the link counts of the two arms in the FK's link ordering
    (base, arm1 links, arm2 links — Pose2Mobile2Arms.cpp:55-90)."""
    p = np.asarray(pose)
    plot_planar_mobile_base(ax, p[:3], size=size, color=color)
    poses = link_poses(robot.fk, p)
    pts = np.asarray(poses.trans)
    n1, n2 = nr_links
    arm1 = np.concatenate([pts[:1], pts[1 : 1 + n1]], axis=0)
    arm2 = np.concatenate([pts[:1], pts[1 + n1 : 1 + n1 + n2]], axis=0)
    ax.plot(arm1[:, 0], arm1[:, 1], "-o", color=color, markersize=3)
    ax.plot(arm2[:, 0], arm2[:, 1], "-o", color=color, markersize=3)


def plot_point_robot_2d(ax, robot: RobotModel, q, color="b"):
    """Point robot as a circle of its body-sphere radius (plotPointRobot2D.m)."""
    import matplotlib.patches as mpatches

    centers = np.asarray(sphere_centers_world(robot, np.asarray(q)))
    r = float(np.asarray(robot.sphere_radii)[0])
    ax.add_patch(mpatches.Circle(centers[0, :2], r, fill=False, color=color))


def plot_planar_mobile_base(ax, pose2, size=(0.4, 0.2), color="b"):
    """SE(2) base rectangle + heading (plotPlanarMobileBase.m)."""
    import matplotlib.transforms as mtransforms
    import matplotlib.patches as mpatches

    x, y, th = [float(v) for v in np.asarray(pose2)]
    rect = mpatches.Rectangle(
        (-size[0] / 2, -size[1] / 2), size[0], size[1], fill=False, color=color
    )
    tr = mtransforms.Affine2D().rotate(th).translate(x, y) + ax.transData
    rect.set_transform(tr)
    ax.add_patch(rect)
    ax.plot([x, x + 0.6 * size[0] * np.cos(th)],
            [y, y + 0.6 * size[0] * np.sin(th)], color=color)


def plot_robot_model_2d(ax, robot: RobotModel, q, color="c"):
    """Body spheres projected to the plane (plotRobotModel.m, planar)."""
    import matplotlib.patches as mpatches

    centers = np.asarray(sphere_centers_world(robot, np.asarray(q)))
    radii = np.asarray(robot.sphere_radii)
    for c, r in zip(centers, radii):
        ax.add_patch(mpatches.Circle(c[:2], float(r), alpha=0.4, color=color))


def plot_map_3d(ax, corner_idx, origin, cell_size, color="k"):
    """Obstacle boxes as wireframes from corner indices (plotMap3D.m)."""
    corners = np.asarray(corner_idx)
    origin = np.asarray(origin)
    for row in corners:
        x0, x1, y0, y1, z0, z1 = row
        lo = origin + cell_size * np.array([x0, y0, z0])
        hi = origin + cell_size * np.array([x1, y1, z1])
        # 12 edges of the box
        pts = np.array([
            [lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
            [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
            [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
            [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]],
        ])
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            ax.plot(*zip(pts[a], pts[b]), color=color, linewidth=0.5)


def plot_robot_model_3d(ax, robot: RobotModel, q, color="c"):
    """Body spheres in 3D (plotRobotModel.m)."""
    centers = np.asarray(sphere_centers_world(robot, np.asarray(q)))
    radii = np.asarray(robot.sphere_radii)
    u = np.linspace(0, 2 * np.pi, 12)
    v = np.linspace(0, np.pi, 8)
    su, sv = np.meshgrid(u, v)
    for c, r in zip(centers, radii):
        xs = c[0] + r * np.cos(su) * np.sin(sv)
        ys = c[1] + r * np.sin(su) * np.sin(sv)
        zs = c[2] + r * np.cos(sv)
        ax.plot_surface(xs, ys, zs, color=color, alpha=0.3, linewidth=0)


def set_3d_plot_range(ax, lo, hi):
    """Equal-aspect 3D limits (set3DPlotRange.m)."""
    ax.set_xlim(lo[0], hi[0])
    ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2], hi[2])
    try:
        ax.set_box_aspect([hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]])
    except AttributeError:
        pass
