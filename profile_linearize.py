"""Micro-profile of the WAM linearize hot path on the current device.

Splits one linearize step into: FK+sphere-Jacobian (all configs), SDF
8-corner gather, trilinear+hinge math, J^T W J einsum accumulation, and the
full traj_linearize, at the headline bench shape (B x 101 configs x S
spheres). Used to direct kernel work; not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from gpmp2_tpu.datasets import generate_3d_dataset, sdf_from_occupancy
from gpmp2_tpu.kinematics.robot import sphere_centers_and_jac
from gpmp2_tpu.obstacle.sdf import sdf_lookup
from gpmp2_tpu.robots import generate_arm

B = int(os.environ.get("B", "1024"))
NCONF = 101  # 11 support + 90 interpolated


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    arm = generate_arm("WAMArm")
    dof = arm.dof
    S = arm.num_spheres
    print(f"WAM dof={dof} spheres={S}, B={B}, configs/prob={NCONF}")

    ds = generate_3d_dataset("WAMDeskDataset")
    sdf = sdf_from_occupancy(ds.origin, ds.cell_size, ds.map)
    print("sdf grid:", sdf.data.shape, sdf.data.dtype)

    key = jax.random.PRNGKey(0)
    confs = jax.random.uniform(key, (B, NCONF, dof), minval=-1.5, maxval=1.5)

    # 1. FK + analytic sphere Jacobians over all configs
    f_fk = jax.jit(
        jax.vmap(jax.vmap(lambda q: sphere_centers_and_jac(arm, q)))
    )
    t_fk, (centers, Jc) = timeit(f_fk, confs)
    print(f"FK+sphereJac: {t_fk:8.1f} ms  centers {centers.shape} J {Jc.shape}")

    # 2. full SDF lookup (gather + trilerp)
    f_sdf = jax.jit(lambda c: sdf_lookup(sdf, c))
    t_sdf, (dist, grad, ok) = timeit(f_sdf, centers)
    print(f"sdf_lookup:   {t_sdf:8.1f} ms")

    # 2b. gather alone (indices precomputed)
    nz, rows, cols = sdf.data.shape
    cs = sdf.cell_size
    pt = np.asarray(centers)
    xyz = (pt - np.asarray(sdf.origin)) / float(cs)
    idx = np.clip(np.floor(xyz).astype(np.int32), 0, np.asarray([cols, rows, nz]) - 1)
    base = (idx[..., 2] * rows + idx[..., 1]) * cols + idx[..., 0]
    base = jnp.asarray(base)
    offs = jnp.asarray(
        [0, cols, 1, cols + 1, rows * cols, rows * cols + cols,
         rows * cols + 1, rows * cols + cols + 1], jnp.int32)
    flat = sdf.data.reshape(-1)
    f_g = jax.jit(lambda b: jnp.take(flat, b[..., None] + offs))
    t_g, vals = timeit(f_g, base)
    print(f"gather only:  {t_g:8.1f} ms  ({vals.size*4/1e6:.1f} MB gathered)")

    # 2c. gather from f16 grid
    flat16 = flat.astype(jnp.bfloat16)
    f_g16 = jax.jit(lambda b: jnp.take(flat16, b[..., None] + offs))
    t_g16, _ = timeit(f_g16, base)
    print(f"gather bf16:  {t_g16:8.1f} ms")

    # 3. einsum accumulation at bench shape: Jz (B, 10, 9, S, 2d)
    m = 2 * dof
    Jz1 = jax.random.normal(key, (B, 10, 9, S, m))
    f_e = jax.jit(lambda J: jnp.einsum("bitsm,bitsn->bimn", J, J))
    t_e, _ = timeit(f_e, Jz1)
    print(f"JtWJ einsum:  {t_e:8.1f} ms")

    # 4. full linearize at bench shape
    from bench import make_bench_problem  # noqa: F401  (if available)


if __name__ == "__main__":
    main()
