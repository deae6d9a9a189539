"""Experiments: fastest way to do the 8-corner SDF gather on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

B, NCONF, S = 1024, 101, 16
NZ = ROWS = COLS = 300


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (NZ, ROWS, COLS))
    flat = data.reshape(-1)
    N = B * NCONF * S
    idx3 = jax.random.randint(key, (N, 3), 0, 298)  # (z, y, x) low corners
    base = (idx3[:, 0] * ROWS + idx3[:, 1]) * COLS + idx3[:, 2]

    offs = jnp.asarray(
        [0, 1, COLS, COLS + 1, ROWS * COLS, ROWS * COLS + 1,
         ROWS * COLS + COLS, ROWS * COLS + COLS + 1], jnp.int32)

    # A. current: one take of N*8 scattered elements
    f_a = jax.jit(lambda b: jnp.take(flat, b[:, None] + offs))
    t, _ = timeit(f_a, base)
    print(f"A take Nx8 scattered:        {t:8.1f} ms")

    # B. 4 gathers of contiguous pairs via lax.gather slice_sizes=(2,)
    def f_b(b):
        pair_offs = jnp.asarray([0, COLS, ROWS * COLS, ROWS * COLS + COLS],
                                jnp.int32)
        starts = (b[:, None] + pair_offs).reshape(-1, 1)  # (4N, 1)
        out = jax.lax.gather(
            flat, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2,), mode="clip")
        return out.reshape(-1, 4, 2)
    t, _ = timeit(jax.jit(f_b), base)
    print(f"B gather 4Nx pairs:          {t:8.1f} ms")

    # C. corner-packed layout: packed[l] = 8 corners contiguous; one gather
    #    of slices of 8
    packed = jnp.stack([jnp.roll(flat, -int(o)) for o in np.asarray(offs)],
                       axis=-1)  # (L, 8) — roll stands in for real packing
    def f_c(b):
        out = jax.lax.gather(
            packed, b[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 8), mode="clip")
        return out
    t, _ = timeit(jax.jit(f_c), base)
    print(f"C packed (L,8) slice gather: {t:8.1f} ms")

    # C16. packed bf16
    packed16 = packed.astype(jnp.bfloat16)
    def f_c16(b):
        return jax.lax.gather(
            packed16, b[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 8), mode="clip")
    t, _ = timeit(jax.jit(f_c16), base)
    print(f"C16 packed bf16:             {t:8.1f} ms")

    # D. pack pairs only (2x memory): gather 4 slices of (1,2)
    packed2 = jnp.stack([flat, jnp.roll(flat, -1)], axis=-1)  # (L, 2)
    def f_d(b):
        pair_offs = jnp.asarray([0, COLS, ROWS * COLS, ROWS * COLS + COLS],
                                jnp.int32)
        starts = (b[:, None] + pair_offs).reshape(-1, 1)
        out = jax.lax.gather(
            packed2, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 2), mode="clip")
        return out.reshape(-1, 4, 2)
    t, _ = timeit(jax.jit(f_d), base)
    print(f"D pair-packed (L,2):         {t:8.1f} ms")

    # E. take with sorted-ish indices (locality test): sort base
    sbase = jnp.sort(base)
    t, _ = timeit(f_a, sbase)
    print(f"E take sorted idx:           {t:8.1f} ms")

    # F. single take of N elements (lower bound for 1 gather/point)
    f_f = jax.jit(lambda b: jnp.take(flat, b))
    t, _ = timeit(f_f, base)
    print(f"F take Nx1 (lower bound):    {t:8.1f} ms")

    # G. take of 8 separate takes (old style)
    def f_g(b):
        return jnp.stack([jnp.take(flat, b + o) for o in offs], -1)
    t, _ = timeit(jax.jit(f_g), base)
    print(f"G 8 separate takes:          {t:8.1f} ms")

    # H. packed (L,8) via take with expanded last dim index
    def f_h(b):
        return jnp.take(packed.reshape(-1), b[:, None] * 8 + jnp.arange(8))
    t, _ = timeit(jax.jit(f_h), base)
    print(f"H packed flat take:          {t:8.1f} ms")


if __name__ == "__main__":
    main()
