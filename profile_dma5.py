"""Round-5 probe, part 5: measure the hand-rolled per-row DMA issue rate.

Part 4 pinned the mechanism: sub-VMEM tables gather at ~5 ns/row, every
table >= 27 MB at ~13 ns/row regardless of size (27 MB == 864 MB), no
overlap across concurrent gather ops, no sorted-index benefit. The one
open question from VERDICT r4 #1: can a hand-rolled Pallas DMA pipeline
beat 13 ns/row, or is that the memory system's random-row rate?

Part 4 also showed make_async_copy DOES compile here (part 3's failures
were kernel-body bugs + PrefetchScalarGridSpec). This part:

  A4' static-slice async copy (corrected body)
  A5' dynamic-slice async copy, index from an SMEM block input
  W1  serial per-row DMA gather (start+wait each row): round-trip bound
  W2  DEPTH-pipelined per-row DMA gather: the real issue-rate number
  W3  like W2 but HBM->HBM (row lands straight in the output buffer)
  X1  XLA flat-gather variant: take from a (L*8,) flat table with
      8-element slices (different gather emitter?)
"""

import functools
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

    x128 = jnp.ones((128, 128), jnp.float32)

    # A4': static-slice async copy, corrected body
    def a4(x):
        def k(i, o, scr, sem):
            c = pltpu.make_async_copy(i.at[pl.ds(0, 8), :], scr, sem)
            c.start()
            c.wait()
            o[:] = scr[:] * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    try_kernel("A4' static-slice copy", a4, x128)

    # A5': dynamic-slice async copy, scalar index from an SMEM input
    def a5(ix, x):
        def k(ix_ref, i, o, scr, sem):
            c = pltpu.make_async_copy(
                i.at[pl.ds(ix_ref[0], 8), :], scr, sem)
            c.start()
            c.wait()
            o[:] = scr[:] * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ix, x)

    ok5 = try_kernel("A5' dyn-slice copy", a5,
                     jnp.zeros((1,), jnp.int32), x128)

    # ---------------- the gather kernels ----------------
    L = 27_000_000
    key = jax.random.PRNGKey(0)
    full = jax.random.normal(key, (L, 8), jnp.float32)
    NQ = 65_536
    idx_np = rng.integers(0, L, size=(NQ,)).astype(np.int32)
    idx = jnp.asarray(idx_np)

    def gather_kernel(depth, hbm_out):
        """Per-row DMA gather: idx chunk arrives in SMEM via BlockSpec,
        rows stream table->out with `depth` DMAs in flight."""
        CHUNK = 2048
        grid = NQ // CHUNK

        def k(ix_ref, tb_ref, out_ref, sems):
            def dma(q, slot):
                dst = out_ref.at[pl.ds(q, 1), :]
                return pltpu.make_async_copy(
                    tb_ref.at[pl.ds(ix_ref[q], 1), :], dst, sems.at[slot])

            if depth == 1:
                def body(q, _):
                    c = dma(q, 0)
                    c.start()
                    c.wait()
                    return 0
                lax.fori_loop(0, CHUNK, body, 0)
            else:
                for d in range(depth):
                    dma(d, d).start()

                def body(q, _):
                    dma(q, q % depth).wait()

                    @pl.when(q + depth < CHUNK)
                    def _():
                        dma(q + depth, (q + depth) % depth).start()
                    return 0
                lax.fori_loop(0, CHUNK, body, 0)

        out_space = pl.ANY if hbm_out else pltpu.VMEM

        def fn(ix, tb):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((NQ, 8), jnp.float32),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((CHUNK,), lambda i: (i,),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((CHUNK, 8), lambda i: (i, 0),
                                       memory_space=out_space),
                scratch_shapes=[pltpu.SemaphoreType.DMA((max(depth, 1),))],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(ix, tb)
        return fn

    def time_gather(name, fn):
        # correctness first
        try:
            got = np.asarray(jax.jit(fn)(idx, full))
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
            return
        want = np.asarray(full)[idx_np]
        ok = np.allclose(got, want)
        print(f"{name}: compiled, correctness "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)

        def mk(k_):
            @jax.jit
            def f(ix, tb):
                def body(i, carry):
                    ix_, acc = carry
                    vals = fn(ix_, tb)
                    s = jnp.sum(vals)
                    ix2 = (ix_ + jnp.int32(1)
                           + (s * 0).astype(jnp.int32)) % L
                    return ix2, acc + s
                _, acc = lax.fori_loop(0, k_, body, (ix, jnp.float32(0)))
                return acc
            return f
        chain_time(name, mk, idx, full, n_rows=NQ)

    time_gather("W1 serial DMA (depth 1)", gather_kernel(1, False))
    time_gather("W2 pipelined DMA depth 8", gather_kernel(8, False))
    time_gather("W2 pipelined DMA depth 16", gather_kernel(16, False))
    time_gather("W3 depth 8, HBM->HBM", gather_kernel(8, True))

    # ---------------- X1: XLA flat-slice gather ----------------
    flat = full.reshape(-1)

    def mk_flat(k_):
        @jax.jit
        def f(tb, ix):
            def body(i, carry):
                ix_, acc = carry
                starts = (ix_ * 8)[:, None]  # (N, 1)
                vals = lax.gather(
                    tb, starts,
                    lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(),
                        start_index_map=(0,)),
                    slice_sizes=(8,), mode=lax.GatherScatterMode.CLIP,
                )
                s = jnp.sum(vals)
                ix2 = (ix_ + jnp.int32(1)
                       + (s * 0).astype(jnp.int32)) % L
                return ix2, acc + s
            _, acc = lax.fori_loop(0, k_, body, (ix, 0.0))
            return acc
        return f

    # XLA reference at NQ for comparison
    def mk_take(k_):
        @jax.jit
        def f(tb, ix):
            def body(i, carry):
                ix_, acc = carry
                vals = jnp.take(tb, ix_, axis=0)
                s = jnp.sum(vals)
                ix2 = (ix_ + jnp.int32(1)
                       + (s * 0).astype(jnp.int32)) % L
                return ix2, acc + s
            _, acc = lax.fori_loop(0, k_, body, (ix, 0.0))
            return acc
        return f

    chain_time("X0 XLA take (N=65536) ", mk_take, full, idx, n_rows=NQ)
    try:
        chain_time("X1 XLA flat 8-slice   ", mk_flat, flat, idx, n_rows=NQ)
    except Exception as e:  # noqa: BLE001
        print(f"X1: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
