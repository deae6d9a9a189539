"""Device-mesh scale-out for batched planning.

The reference has no distributed layer (SURVEY.md section 2.11): users run
the C++ planner in a loop. Here, scale-out is first-class: the problem
batch shards across a `jax.sharding.Mesh` ('dp' axis over ICI within a
slice, DCN across hosts), the jitted batched solve partitions automatically
under GSPMD, and cross-problem reductions (the `any(active)` convergence
test inside the optimizer while_loop, cost statistics) become XLA
collectives over the mesh — the TPU-native analog of a "communication
backend". Planning problems are embarrassingly parallel, so the only
communication is these small reductions riding ICI.

Typical use:
    mesh = make_mesh()                       # all local devices on 'dp'
    probs, axes = ...                        # from make_problem/infer_batch_axes
    probs, traj = shard_problems(mesh, probs, traj, axes)
    res = jax.jit(lambda p, t: plan_batch(p, t, params, axes))(probs, traj)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_problems", "replicate", "batch_sharding"]


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a device mesh. Default: all devices on a single 'dp' axis.

    Multi-axis example (future trajectory-axis sharding):
        make_mesh(shape=(4, 2), axis_names=('dp', 'ts'))
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding that partitions the leading (problem-batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_problems(mesh: Mesh, problems, traj, problem_axes, axis: str = "dp"):
    """Place a problem batch on the mesh: batched leaves (axis 0 in
    `problem_axes`) shard over `axis`; shared leaves (None) replicate.

    Returns (problems, traj) device-put onto the mesh.
    """
    shard = batch_sharding(mesh, axis)
    repl = replicate(mesh)

    def place(leaf, ax):
        return jax.device_put(leaf, shard if ax == 0 else repl)

    # problem_axes is a matching pytree of {0, None}; None collapses to an
    # empty subtree under tree_map, so walk leaves with a paired traversal.
    leaves, treedef = jax.tree_util.tree_flatten(problems)
    ax_flat = _flatten_axes_like(problem_axes, problems)
    placed = [place(l, a) for l, a in zip(leaves, ax_flat)]
    problems = jax.tree_util.tree_unflatten(treedef, placed)
    traj = jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), traj)
    return problems, traj


def _flatten_axes_like(axes_tree, value_tree):
    """Flatten an in_axes tree produced leaf-for-leaf by infer_batch_axes
    (None leaves mean broadcast), aligned with the value pytree's leaves."""
    ax_flat = jax.tree_util.tree_flatten(axes_tree, is_leaf=lambda x: x is None)[0]
    n_vals = len(jax.tree_util.tree_leaves(value_tree))
    if len(ax_flat) != n_vals:
        raise ValueError(
            f"axes tree has {len(ax_flat)} leaves but value tree has {n_vals}"
        )
    return ax_flat
