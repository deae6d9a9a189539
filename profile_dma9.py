"""Round-5 probe, part 9: is the 13-14 ns/row floor the DMA pipeline depth,
the scalar-core loop, or the memory system?

W4 (part 8) measured a hand-rolled (1,128)-row DMA gather at 14.11 ns/row
with depth 8 — the same rate as XLA's gather (13-14 ns/row). Two ways that
number could still fall:
  - deeper pipeline (depth 8 x ~112 ns/DMA just covers ~900 ns of HBM
    latency — depth 32/64 would expose a faster issue rate if latency
    were the binder)
  - unrolled issue loop (14 ns = ~13 scalar-core cycles: one fori_loop
    iteration's SMEM read + descriptor + semaphore bookkeeping could BE
    the floor; issuing 2-4 DMAs per iteration halves/quarters it)

Output rows land straight in HBM (out in ANY memspace, grid=1) so N can
be large with no VMEM pressure. Run: python profile_dma9.py [D U]...
(each D,U pair in a fresh process if a compile failure wedges the
backend; default sweep inline).
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
    NQ = int(os.environ.get("NQ", "32768"))
    rng = np.random.default_rng(0)
    print(f"device {jax.devices()[0]}  NQ={NQ}", flush=True)

    L = 100_000
    key = jax.random.PRNGKey(0)
    tbw = jax.random.normal(key, (L, 128), jnp.float32)
    idx_np = rng.integers(0, L, size=(NQ,)).astype(np.int32)
    idxq = jnp.asarray(idx_np)

    def gather(depth, unroll, hbm_out=True):
        assert depth % unroll == 0 and NQ % unroll == 0

        def fn(ix, tb):
            def k(ix_ref, tb_ref, out_ref, sems):
                def dma(q, slot):
                    return pltpu.make_async_copy(
                        tb_ref.at[pl.ds(ix_ref[q], 1), :],
                        out_ref.at[pl.ds(q, 1), :],
                        sems.at[slot])

                for d in range(depth):
                    dma(d, d).start()

                def body(i, _):
                    q0 = i * unroll
                    for u in range(unroll):
                        q = q0 + u
                        dma(q, lax.rem(q, depth)).wait()

                        @pl.when(q + depth < NQ)
                        def _():
                            dma(q + depth, lax.rem(q, depth)).start()
                    return 0
                lax.fori_loop(0, NQ // unroll, body, 0)

            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((NQ, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    memory_space=pl.ANY if hbm_out else pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(ix, tb)
        return fn

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

    def run(depth, unroll):
        fn = gather(depth, unroll)
        try:
            got = np.asarray(jax.jit(fn)(idxq, tbw))
        except Exception as e:  # noqa: BLE001
            print(f"D{depth} U{unroll}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
            return
        ok = np.allclose(got, np.asarray(tbw)[idx_np])
        if not ok:
            print(f"D{depth} U{unroll}: MISMATCH", flush=True)
            return

        def mk(k_):
            @jax.jit
            def f(ix, tb):
                def body(i, carry):
                    ix_, acc = carry
                    vals = fn(ix_, tb)
                    s = jnp.sum(vals[:, 0])
                    ix2 = (ix_ + jnp.int32(1)
                           + (s * 0).astype(jnp.int32)) % L
                    return ix2, acc + s
                _, acc = lax.fori_loop(0, k_, body, (ix, jnp.float32(0)))
                return acc
            return f
        chain_time(f"D{depth:>3} U{unroll}", mk, idxq, tbw, n_rows=NQ)

    args = sys.argv[1:]
    if args:
        pairs = [tuple(map(int, a.split(","))) for a in args]
    else:
        pairs = [(8, 1), (16, 1), (32, 1), (64, 1), (16, 2), (32, 4),
                 (64, 8)]
    for d, u in pairs:
        run(d, u)


if __name__ == "__main__":
    main()
