"""Round-5 probe, part 2: pin down the DMA issue rate + retime key
variants with a longer chain (K=16) to beat tunnel noise.

Part 1 (profile_dma_gather.py) showed K=4 chaining is too noisy on this
tunnel (negative deltas), and the first DMA kernel hit a Mosaic internal
error on 1-D `.at[idx]` row refs. This version uses 2-D `pl.ds` slices,
a smaller chunk, and K=16 chains.
"""

import os
import sys
import time

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

    B = int(os.environ.get("B", "2048"))
    K = int(os.environ.get("K", "16"))
    N = B * 101 * 16
    rng = np.random.default_rng(0)
    print(f"device {jax.devices()[0]}  N={N}  K={K}", flush=True)

    def chain_time(label, make_fn, *args, reps=5, n_rows=N):
        f1, fK = make_fn(1), make_fn(K)
        t1 = tK = np.inf
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            np.asarray(f1(*args))
            t1 = min(t1, time.perf_counter() - t0)
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            np.asarray(fK(*args))
            tK = min(tK, time.perf_counter() - t0)
        per = (tK - t1) / (K - 1) * 1e3
        print(f"{label}: {per:8.2f} ms  ({per * 1e6 / n_rows:6.2f} ns/row)"
              f"   [T1 {t1*1e3:.1f} TK {tK*1e3:.1f}]", flush=True)
        return per

    L_FULL = 300 * 300 * 300
    key = jax.random.PRNGKey(0)
    full = jax.random.normal(key, (L_FULL, 8), jnp.float32)

    # Structured indices with bench-like locality: per "problem", 16
    # sphere queries in a small neighborhood, consecutive states nearby.
    centers = rng.integers(0, L_FULL - 40000, size=(N // 16,))
    jitter = rng.integers(0, 16000, size=(N // 16, 16))
    idx_struct = jnp.asarray(
        (centers[:, None] + jitter).reshape(-1), jnp.int32)
    idx_rand = jnp.asarray(rng.integers(0, L_FULL, size=(N,)), jnp.int32)

    def mk_gather(nrows):
        def make(k):
            @jax.jit
            def f(tb, idx):
                def body(i, carry):
                    idx_, acc = carry
                    vals = jnp.take(tb, idx_, axis=0)
                    s = jnp.sum(vals)
                    idx2 = (idx_ + jnp.int32(1)
                            + (s * 0).astype(jnp.int32)) % nrows
                    return idx2, acc + s
                _, acc = lax.fori_loop(0, k, body, (idx, 0.0))
                return acc
            return f
        return make

    chain_time("A  (27M,8) RANDOM idx   ", mk_gather(L_FULL), full, idx_rand)
    chain_time("A' (27M,8) STRUCTURED   ", mk_gather(L_FULL), full,
               idx_struct)

    # ---------- DMA kernel, attempt 2: 2-D slice refs ----------
    N_DMA = int(os.environ.get("NDMA", "16384"))
    CHUNK = N_DMA
    DEPTH = 8

    def dma_kernel(idx_ref, table_ref, out_ref, sems):
        def dma(q, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[q], 1), :],
                out_ref.at[pl.ds(q, 1), :],
                sems.at[slot],
            )

        for d in range(DEPTH):
            dma(d, d).start()

        def body(q, _):
            dma(q, q % DEPTH).wait()

            @pl.when(q + DEPTH < CHUNK)
            def _():
                dma(q + DEPTH, q % DEPTH).start()

            return 0

        lax.fori_loop(0, CHUNK, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
    )

    dma_gather = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((N_DMA, 8), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    idx_dma = jnp.asarray(rng.integers(0, L_FULL, size=(N_DMA,)), jnp.int32)

    def mk_dma(k):
        @jax.jit
        def f(idx, tb):
            def body(i, carry):
                idx_, acc = carry
                vals = dma_gather(idx_, tb)
                s = jnp.sum(vals)
                idx2_ = (idx_ + jnp.int32(1)
                         + (s * 0).astype(jnp.int32)) % L_FULL
                return idx2_, acc + s
            _, acc = lax.fori_loop(0, k, body, (idx, jnp.float32(0)))
            return acc
        return f

    try:
        chain_time(f"F  pallas DMA (N={N_DMA})", mk_dma,
                   idx_dma, full, n_rows=N_DMA)
    except Exception as e:  # noqa: BLE001
        print(f"F  pallas DMA FAILED: {type(e).__name__}: {str(e)[:600]}",
              flush=True)

    chain_time(f"F' XLA gather (N={N_DMA})", mk_gather(L_FULL),
               full, idx_dma, n_rows=N_DMA)

    # ---------- batched-descriptor DMA: 8 rows per descriptor ----------
    # (measures whether fewer, fatter descriptors change the issue rate;
    # gathers 8 CONSECUTIVE rows per index — not semantically useful, but
    # isolates descriptor-count vs bytes)
    def dma_kernel8(idx_ref, table_ref, out_ref, sems):
        def dma(q, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[q * 8], 8), :],
                out_ref.at[pl.ds(q * 8, 8), :],
                sems.at[slot],
            )

        for d in range(DEPTH):
            dma(d, d).start()

        nq = CHUNK // 8

        def body(q, _):
            dma(q, q % DEPTH).wait()

            @pl.when(q + DEPTH < nq)
            def _():
                dma(q + DEPTH, q % DEPTH).start()

            return 0

        lax.fori_loop(0, nq, body, 0)

    dma_gather8 = pl.pallas_call(
        dma_kernel8,
        out_shape=jax.ShapeDtypeStruct((N_DMA, 8), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def mk_dma8(k):
        @jax.jit
        def f(idx, tb):
            def body(i, carry):
                idx_, acc = carry
                vals = dma_gather8(idx_, tb)
                s = jnp.sum(vals)
                idx2_ = (idx_ + jnp.int32(1)
                         + (s * 0).astype(jnp.int32)) % (L_FULL - 8)
                return idx2_, acc + s
            _, acc = lax.fori_loop(0, k, body, (idx, jnp.float32(0)))
            return acc
        return f

    try:
        chain_time(f"F8 pallas DMA 8-row desc", mk_dma8,
                   idx_dma, full, n_rows=N_DMA)
    except Exception as e:  # noqa: BLE001
        print(f"F8 pallas DMA8 FAILED: {type(e).__name__}: {str(e)[:600]}",
              flush=True)


if __name__ == "__main__":
    main()
