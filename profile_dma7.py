"""Round-5 probe, part 7: final bisect of the Mosaic INTERNAL error.

Part 6: ONE dynamic-slice DMA compiles (A5'), but 64 unrolled ones fail
(T3) — so it's the count, the SMEM input shape, or the start/wait
interleaving. Ladder:

  U1  SMEM input shape (64,), ONE dma from ix_ref[0]
  U2  SMEM input shape (64,), ONE dma from ix_ref[63]
  U3  two unrolled dmas (ix_ref[0], ix_ref[1])
  U4  eight unrolled dmas
  U5  one dma with a COMPUTED index (ix_ref[0] + 7)
  U6  two dmas sharing one start/start then wait/wait order
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    print(f"device {jax.devices()[0]}", flush=True)

    L = 100_000
    key = jax.random.PRNGKey(0)
    tb = jax.random.normal(key, (L, 8), jnp.float32)
    idx64 = jnp.asarray(rng.integers(0, L, size=(64,)).astype(np.int32))

    def try_kernel(name, fn, *inputs):
        try:
            out = jax.block_until_ready(jax.jit(fn)(*inputs))
            print(f"{name}: COMPILED ok (sum {float(jnp.sum(out)):.3f})",
                  flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
            return False

    def make(body_fn, n_sem=1):
        def fn(ix, tb):
            def k(ix_ref, tb_ref, out_ref, scr, sem):
                body_fn(ix_ref, tb_ref, scr, sem)
                out_ref[:] = jnp.broadcast_to(scr[0, :], out_ref.shape)
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((1, 8), jnp.float32),
                    (pltpu.SemaphoreType.DMA((n_sem,)) if n_sem > 1
                     else pltpu.SemaphoreType.DMA(())),
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(ix, tb)
        return fn

    def one(i):
        def body(ix_ref, tb_ref, scr, sem):
            c = pltpu.make_async_copy(
                tb_ref.at[pl.ds(ix_ref[i], 1), :], scr, sem)
            c.start()
            c.wait()
        return body

    try_kernel("U1 one dma, ix[0], (64,) smem", make(one(0)), idx64, tb)
    try_kernel("U2 one dma, ix[63]", make(one(63)), idx64, tb)

    def two(ix_ref, tb_ref, scr, sem):
        for q in range(2):
            c = pltpu.make_async_copy(
                tb_ref.at[pl.ds(ix_ref[q], 1), :], scr, sem)
            c.start()
            c.wait()

    try_kernel("U3 two unrolled dmas", make(two), idx64, tb)

    def eight(ix_ref, tb_ref, scr, sem):
        for q in range(8):
            c = pltpu.make_async_copy(
                tb_ref.at[pl.ds(ix_ref[q], 1), :], scr, sem)
            c.start()
            c.wait()

    try_kernel("U4 eight unrolled dmas", make(eight), idx64, tb)

    def computed(ix_ref, tb_ref, scr, sem):
        c = pltpu.make_async_copy(
            tb_ref.at[pl.ds(ix_ref[0] + 7, 1), :], scr, sem)
        c.start()
        c.wait()

    try_kernel("U5 computed index", make(computed), idx64, tb)

    def overlap(ix_ref, tb_ref, scr, sems):
        c0 = pltpu.make_async_copy(
            tb_ref.at[pl.ds(ix_ref[0], 1), :], scr, sems.at[0])
        c1 = pltpu.make_async_copy(
            tb_ref.at[pl.ds(ix_ref[1], 1), :], scr, sems.at[1])
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

    try_kernel("U6 two overlapped dmas", make(overlap, n_sem=2), idx64, tb)


if __name__ == "__main__":
    main()
