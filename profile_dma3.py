"""Round-5 probe, part 3: find a Mosaic-compilable DMA-gather form and
measure the per-descriptor issue rate; re-time part-1's table variants at
K=16 (part-1's K=4 numbers were tunnel noise — A measured 19 ms there vs
the true 43.4 ms).

Variants V1..V5 escalate from trivially-compilable to the full dynamic
row gather; the first failure isolates what Mosaic rejects.
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

    K = int(os.environ.get("K", "16"))
    rng = np.random.default_rng(0)
    print(f"device {jax.devices()[0]}  K={K}", flush=True)

    def chain_time(label, make_fn, *args, reps=4, n_rows=1):
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
        print(f"{label}: {per:8.2f} ms  ({per * 1e6 / n_rows:7.2f} ns/row)"
              f"   [T1 {t1*1e3:.1f} TK {tK*1e3:.1f}]", flush=True)
        return per

    L_FULL = 300 * 300 * 300
    key = jax.random.PRNGKey(0)
    full = jax.random.normal(key, (L_FULL, 8), jnp.float32)

    # ---------------- Mosaic DMA compile ladder ----------------
    NQ = 4096

    def try_kernel(name, kernel, out_shape, grid_spec, inputs):
        try:
            fn = pl.pallas_call(
                kernel, out_shape=out_shape, grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )
            out = jax.block_until_ready(jax.jit(fn)(*inputs))
            print(f"{name}: COMPILED ok (out sum {float(jnp.sum(out)):.3f})",
                  flush=True)
            return fn
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
            return None

    idx_np = rng.integers(0, L_FULL, size=(NQ,)).astype(np.int32)
    idx = jnp.asarray(idx_np)

    # V1: single static DMA of a whole block HBM->VMEM
    def v1(idx_ref, tb_ref, out_ref, sem):
        pltpu.make_async_copy(
            tb_ref.at[pl.ds(0, NQ), :], out_ref, sem).start()
        pltpu.make_async_copy(
            tb_ref.at[pl.ds(0, NQ), :], out_ref, sem).wait()

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    try_kernel("V1 one static block DMA", v1,
               jax.ShapeDtypeStruct((NQ, 8), jnp.float32), gs, (idx, full))

    # V2: serial per-row DMA, STATIC indices (python loop, 64 rows)
    def v2(idx_ref, tb_ref, out_ref, sem):
        for q in range(64):
            c = pltpu.make_async_copy(
                tb_ref.at[pl.ds(q * 7, 1), :], out_ref.at[pl.ds(q, 1), :],
                sem)
            c.start()
            c.wait()

    try_kernel("V2 serial static-row DMAs", v2,
               jax.ShapeDtypeStruct((64, 8), jnp.float32), gs, (idx, full))

    # V3: serial per-row DMA, DYNAMIC index from scalar-prefetch (64 rows)
    def v3(idx_ref, tb_ref, out_ref, sem):
        for q in range(64):
            c = pltpu.make_async_copy(
                tb_ref.at[pl.ds(idx_ref[q], 1), :],
                out_ref.at[pl.ds(q, 1), :], sem)
            c.start()
            c.wait()

    try_kernel("V3 serial dyn-row DMAs", v3,
               jax.ShapeDtypeStruct((64, 8), jnp.float32), gs, (idx, full))

    # V4: fori_loop per-row DMA, dynamic index, serial wait
    def v4(idx_ref, tb_ref, out_ref, sem):
        def body(q, _):
            c = pltpu.make_async_copy(
                tb_ref.at[pl.ds(idx_ref[q], 1), :],
                out_ref.at[pl.ds(q, 1), :], sem)
            c.start()
            c.wait()
            return 0

        lax.fori_loop(0, NQ, body, 0)

    v4fn = try_kernel("V4 fori serial dyn DMAs", v4,
                      jax.ShapeDtypeStruct((NQ, 8), jnp.float32), gs,
                      (idx, full))

    # V5: fori_loop pipelined, DEPTH in flight
    DEPTH = 8
    gs5 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
    )

    def v5(idx_ref, tb_ref, out_ref, sems):
        def dma(q, slot):
            return pltpu.make_async_copy(
                tb_ref.at[pl.ds(idx_ref[q], 1), :],
                out_ref.at[pl.ds(q, 1), :], sems.at[slot])

        for d in range(DEPTH):
            dma(d, d).start()

        def body(q, _):
            dma(q, q % DEPTH).wait()

            @pl.when(q + DEPTH < NQ)
            def _():
                dma(q + DEPTH, q % DEPTH).start()

            return 0

        lax.fori_loop(0, NQ, body, 0)

    v5fn = try_kernel("V5 fori pipelined dyn DMAs", v5,
                      jax.ShapeDtypeStruct((NQ, 8), jnp.float32), gs5,
                      (idx, full))

    # time whichever compiled (per-row ns)
    for name, fn in (("V4", v4fn), ("V5", v5fn)):
        if fn is None:
            continue

        def mk(k, fn=fn):
            @jax.jit
            def f(ix, tb):
                def body(i, carry):
                    ix_, acc = carry
                    vals = fn(ix_, tb)
                    s = jnp.sum(vals)
                    ix2 = (ix_ + jnp.int32(1)
                           + (s * 0).astype(jnp.int32)) % L_FULL
                    return ix2, acc + s
                _, acc = lax.fori_loop(0, k, body, (ix, jnp.float32(0)))
                return acc
            return f

        # correctness spot-check
        got = np.asarray(jax.jit(fn)(idx, full))
        want = np.asarray(full)[idx_np]
        ok = np.allclose(got, want)
        print(f"{name} correctness: {'OK' if ok else 'MISMATCH'}",
              flush=True)
        chain_time(f"{name} DMA gather (N={NQ})", mk, idx, full, n_rows=NQ)

    # XLA reference at N=4096
    def mk_gather(nrows):
        def make(k):
            @jax.jit
            def f(tb, ix):
                def body(i, carry):
                    ix_, acc = carry
                    vals = jnp.take(tb, ix_, axis=0)
                    s = jnp.sum(vals)
                    ix2 = (ix_ + jnp.int32(1)
                           + (s * 0).astype(jnp.int32)) % nrows
                    return ix2, acc + s
                _, acc = lax.fori_loop(0, k, body, (ix, 0.0))
                return acc
            return f
        return make

    chain_time(f"XLA gather (N={NQ})", mk_gather(L_FULL), full, idx,
               n_rows=NQ)

    # ---------------- K=16 re-times of part-1 variants ----------------
    N = 2048 * 101 * 16
    for L, W in ((421_875, 8), (3_375_000, 8), (421_875, 128),
                 (3_375_000, 32)):
        tb = jax.random.normal(key, (L, W), jnp.float32)
        ixf = jnp.asarray(rng.integers(0, L, size=(N,)), jnp.int32)
        chain_time(f"T  ({L:>9}, {W:>3}) gather", mk_gather(L), tb, ixf,
                   n_rows=N)


if __name__ == "__main__":
    main()
