"""Round-5 probe, part 8: vary ONE thing at a time from the known-good
A5' dynamic-slice DMA (SMEM (1,) index, table (128,128), copy (8,128)).

  Va  SMEM index input (64,) instead of (1,)
  Vb  copy (1,128) instead of (8,128)
  Vc  table (100000, 8), copy (8, 8)
  Vd  table (100000, 8), copy (1, 8)          <- the per-row gather shape
  Ve  table (100000, 128), copy (1, 128)      <- row-padded gather shape
  Vf  Ve + 16 unrolled copies, distinct sems  <- the issue-rate building block
Then, if Ve/Vf compile: W4 pipelined (1,128)-row gather at depth 8, 4096
rows per kernel, timed -> the hand-DMA ns/row number VERDICT asks for.

Run `python profile_dma8.py Va Vb ...` to select variants (a failed Mosaic
remote-compile can wedge the whole backend session — part-8 first run saw
every subsequent call ABORTED — so the driver shell runs each variant in a
fresh process).
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
    print(f"device {jax.devices()[0]}", flush=True)

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

    def variant(tb_shape, copy_rows, copy_cols, ix_shape, n_copies=1):
        def fn(ix, tb):
            def k(ix_ref, tb_ref, out_ref, scr, sems):
                for q in range(n_copies):
                    c = pltpu.make_async_copy(
                        tb_ref.at[pl.ds(ix_ref[q % ix_shape], copy_rows),
                                  :],
                        scr,
                        sems.at[q] if n_copies > 1 else sems)
                    c.start()
                    c.wait()
                out_ref[:] = jnp.broadcast_to(scr[0, :][None, :],
                                              out_ref.shape)
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8, copy_cols), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((copy_rows, copy_cols), jnp.float32),
                    (pltpu.SemaphoreType.DMA((n_copies,)) if n_copies > 1
                     else pltpu.SemaphoreType.DMA(())),
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(ix, tb)
        return fn

    key = jax.random.PRNGKey(0)
    tb128 = jax.random.normal(key, (128, 128), jnp.float32)
    tb8 = jax.random.normal(key, (100_000, 8), jnp.float32)
    tbw = jax.random.normal(key, (100_000, 128), jnp.float32)
    ix1 = jnp.zeros((1,), jnp.int32)
    ix64 = jnp.asarray(rng.integers(0, 90_000, size=(64,)).astype(np.int32))

    sel = set(sys.argv[1:])

    def want(name):
        return not sel or name in sel

    if want("Va"):
        try_kernel("Va smem(64) copy(8,128)",
                   variant((128, 128), 8, 128, 64), ix64, tb128)
    if want("Vb"):
        try_kernel("Vb copy(1,128)", variant((128, 128), 1, 128, 1),
                   ix1, tb128)
    if want("Vc"):
        try_kernel("Vc tb(L,8) copy(8,8)", variant((0, 8), 8, 8, 1),
                   ix1, tb8)
    if want("Vd"):
        try_kernel("Vd tb(L,8) copy(1,8)", variant((0, 8), 1, 8, 1),
                   ix1, tb8)
    if want("Ve"):
        try_kernel("Ve tb(L,128) copy(1,128)",
                   variant((0, 128), 1, 128, 1), ix1, tbw)
    if want("Vf"):
        try_kernel("Vf 16 copies distinct sems",
                   variant((0, 128), 1, 128, 64, n_copies=16), ix64, tbw)
    if sel and "W4" not in sel:
        return

    # ---------------- W4: pipelined row gather, timed ----------------
    NQ = 4096
    DEPTH = 8
    L = 100_000
    idx_np = rng.integers(0, L, size=(NQ,)).astype(np.int32)
    idxq = jnp.asarray(idx_np)

    def w4(ix, tb):
        def k(ix_ref, tb_ref, out_ref, sems):
            def dma(q, slot):
                return pltpu.make_async_copy(
                    tb_ref.at[pl.ds(ix_ref[q], 1), :],
                    out_ref.at[pl.ds(q, 1), :],
                    sems.at[slot])

            for d in range(DEPTH):
                dma(d, d).start()

            def body(q, _):
                dma(q, lax.rem(q, DEPTH)).wait()

                @pl.when(q + DEPTH < NQ)
                def _():
                    dma(q + DEPTH, lax.rem(q, DEPTH)).start()
                return 0
            lax.fori_loop(0, NQ, body, 0)

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((NQ, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ix, tb)

    try:
        got = np.asarray(jax.jit(w4)(idxq, tbw))
        want = np.asarray(tbw)[idx_np]
        print(f"W4 compiled, correctness "
              f"{'OK' if np.allclose(got, want) else 'MISMATCH'}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"W4: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
        return

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

    def mk(k_):
        @jax.jit
        def f(ix, tb):
            def body(i, carry):
                ix_, acc = carry
                vals = w4(ix_, tb)
                s = jnp.sum(vals[:, 0])
                ix2 = (ix_ + jnp.int32(1)
                       + (s * 0).astype(jnp.int32)) % L
                return ix2, acc + s
            _, acc = lax.fori_loop(0, k_, body, (ix, jnp.float32(0)))
            return acc
        return f

    chain_time(f"W4 DMA row gather (N={NQ}, depth {DEPTH})", mk, idxq, tbw,
               n_rows=NQ)


if __name__ == "__main__":
    main()
