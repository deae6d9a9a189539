"""Round-5 probe, part 6: bisect the Mosaic INTERNAL failure in the
per-row DMA gather (part 5: single dynamic-slice DMA compiles, the
fori_loop-driven chunked gather does not).

T1  grid=32 + SMEM index-chunk BlockSpec, ONE dma per grid step
T2  grid=1, fori_loop(64) of dyn-idx DMAs into a FIXED scratch row
T3  grid=1, python-unrolled 64 dyn-idx DMAs into fixed scratch row
T4  grid=1, fori_loop(64) of dyn-idx DMAs into dynamic out rows
T5  grid=1, fori_loop(64), sems.at[q % 4] slot rotation, fixed dst
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
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
    idx2k = jnp.asarray(rng.integers(0, L, size=(2048,)).astype(np.int32))

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

    # T1: grid + SMEM block chunks, one DMA per step
    def t1(ix, tb):
        def k(ix_ref, tb_ref, out_ref, scr, sem):
            c = pltpu.make_async_copy(
                tb_ref.at[pl.ds(ix_ref[0], 1), :],
                scr, sem)
            c.start()
            c.wait()
            out_ref[:] = jnp.broadcast_to(scr[0, :], out_ref.shape)
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((32, 8), jnp.float32),
            grid=(32,),
            in_specs=[
                pl.BlockSpec((64,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 8), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ix, tb)

    try_kernel("T1 grid+SMEM chunk, 1 dma/step", t1, idx2k, tb)

    # T2: fori_loop of dyn-idx DMAs into a fixed scratch row
    def t2(ix, tb):
        def k(ix_ref, tb_ref, out_ref, scr, sem):
            def body(q, _):
                c = pltpu.make_async_copy(
                    tb_ref.at[pl.ds(ix_ref[q], 1), :], scr, sem)
                c.start()
                c.wait()
                return 0
            lax.fori_loop(0, 64, body, 0)
            out_ref[:] = jnp.broadcast_to(scr[0, :], out_ref.shape)
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 8), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ix, tb)

    try_kernel("T2 fori dyn DMAs, fixed dst", t2, idx64, tb)

    # T3: python-unrolled dyn DMAs, fixed dst
    def t3(ix, tb):
        def k(ix_ref, tb_ref, out_ref, scr, sem):
            for q in range(64):
                c = pltpu.make_async_copy(
                    tb_ref.at[pl.ds(ix_ref[q], 1), :], scr, sem)
                c.start()
                c.wait()
            out_ref[:] = jnp.broadcast_to(scr[0, :], out_ref.shape)
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 8), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ix, tb)

    try_kernel("T3 unrolled dyn DMAs, fixed dst", t3, idx64, tb)

    # T4: fori_loop dyn DMAs into dynamic VMEM out rows
    def t4(ix, tb):
        def k(ix_ref, tb_ref, out_ref, sem):
            def body(q, _):
                c = pltpu.make_async_copy(
                    tb_ref.at[pl.ds(ix_ref[q], 1), :],
                    out_ref.at[pl.ds(q, 1), :], sem)
                c.start()
                c.wait()
                return 0
            lax.fori_loop(0, 64, body, 0)
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((64, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ix, tb)

    try_kernel("T4 fori dyn DMAs, dyn dst rows", t4, idx64, tb)

    # T5: fori_loop, rotating semaphore slots, fixed dst
    def t5(ix, tb):
        def k(ix_ref, tb_ref, out_ref, scr, sems):
            def body(q, _):
                c = pltpu.make_async_copy(
                    tb_ref.at[pl.ds(ix_ref[q], 1), :], scr,
                    sems.at[lax.rem(q, 4)])
                c.start()
                c.wait()
                return 0
            lax.fori_loop(0, 64, body, 0)
            out_ref[:] = jnp.broadcast_to(scr[0, :], out_ref.shape)
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 8), jnp.float32),
                            pltpu.SemaphoreType.DMA((4,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ix, tb)

    try_kernel("T5 fori dyn DMAs, sem slots", t5, idx64, tb)


if __name__ == "__main__":
    main()
