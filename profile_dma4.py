"""Round-5 probe, part 4: pin the gather floor's mechanism.

Part 3 found (a) every make_async_copy kernel fails Mosaic remote-compile
(HTTP 500 internal error), (b) a width-8 table at 421875 rows (13.5 MB)
gathers at 4.97 ns/row vs 13.66 at 3.375M rows (108 MB) — consistent with
XLA staging sub-VMEM tables on-chip. This part:

  A  Mosaic blame ladder: plain VMEM copy kernel (known-good form), then
     + input in ANY memspace, then + make_async_copy — the first failure
     isolates whether DMA itself or the memory-space plumbing breaks the
     remote compiler.
  B  table-size sweep at width 8 (fixed 3.3M queries): 13.5, 27, 54, 108,
     432, 864 MB — locate the cliff; if it sits at ~VMEM size the small
     table is being staged on-chip and 13 ns/row is HBM's random-row rate.
  C  concurrency: one N-row gather vs 2x N/2 and 4x N/4 independent
     gathers in the same program — does XLA overlap gather ops?
  D  sorted vs random indices at 864 MB — bounds any sort-based scheme.
  E  supercell extraction cost: (N, 128) rows + per-query take_along_axis
     of 8 lanes — the VPU-side price of the (75^3, 128) repack whose
     gather measured 11.04 ns/row.
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

    # ---------------- A: Mosaic blame ladder ----------------
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

    # A1: plain VMEM elementwise (the known-good btsolve form)
    def a1(x):
        def k(i, o):
            o[:] = i[:] * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    try_kernel("A1 plain VMEM kernel", a1, x128)

    # A2: input left in ANY memspace, read via static slice (no DMA)
    def a2(x):
        def k(i, o):
            o[:] = i[0:128, :] * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    try_kernel("A2 ANY-memspace direct read", a2, x128)

    # A3: ANY input + one make_async_copy into scratch
    def a3(x):
        def k(i, o, scr, sem):
            c = pltpu.make_async_copy(i, scr, sem)
            c.start()
            c.wait()
            o[:] = scr[:] * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    ok_a3 = try_kernel("A3 whole-array async copy", a3, x128)

    # A4: ANY input + make_async_copy of a STATIC row slice
    def a4(x):
        def k(i, o, scr, sem):
            c = pltpu.make_async_copy(i.at[pl.ds(0, 8), :], scr, sem)
            c.start()
            c.wait()
            o[:] = jnp.broadcast_to(scr[:], (128, 128)) * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    try_kernel("A4 static-slice async copy", a4, x128)

    # A5: dynamic-slice async copy (index from SMEM input)
    def a5_wrap(x, ix):
        def k(ix_ref, i, o, scr, sem):
            c = pltpu.make_async_copy(
                i.at[pl.ds(ix_ref[0], 8), :], scr, sem)
            c.start()
            c.wait()
            o[:] = jnp.broadcast_to(scr[:], (128, 128)) * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x, ix)

    # note: SMEM in_spec wants shape (1,) int32
    try_kernel("A5 dyn-slice async copy", lambda ix, x: a5_wrap(ix, x),
               jnp.zeros((1,), jnp.int32), x128)

    # ---------------- B: table-size sweep, width 8 ----------------
    N = 2048 * 101 * 16  # 3,309,568 bench-shape queries
    key = jax.random.PRNGKey(0)

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

    for L in (421_875, 843_750, 1_687_500, 3_375_000, 13_500_000,
              27_000_000):
        tb = jax.random.normal(key, (L, 8), jnp.float32)
        ixf = jnp.asarray(rng.integers(0, L, size=(N,)), jnp.int32)
        mb = L * 32 / 1e6
        chain_time(f"B  ({L:>9}, 8) {mb:7.1f} MB", mk_gather(L), tb, ixf,
                   n_rows=N)
        del tb, ixf

    # ---------------- C: concurrent gathers ----------------
    L = 27_000_000
    tb = jax.random.normal(key, (L, 8), jnp.float32)
    ix_full = jnp.asarray(rng.integers(0, L, size=(N,)), jnp.int32)

    def mk_split(parts):
        def make(k):
            @jax.jit
            def f(tb, ix):
                chunks = jnp.split(ix, parts)

                def body(i, carry):
                    ixs, acc = carry
                    s = jnp.float32(0)
                    outs = []
                    for c in ixs:
                        v = jnp.take(tb, c, axis=0)
                        s = s + jnp.sum(v)
                    ixs2 = tuple(
                        (c + jnp.int32(1) + (s * 0).astype(jnp.int32)) % L
                        for c in ixs)
                    return ixs2, acc + s
                _, acc = lax.fori_loop(0, k, body, (tuple(chunks), 0.0))
                return acc
            return f
        return make

    chain_time("C  1 gather x N    ", mk_gather(L), tb, ix_full, n_rows=N)
    chain_time("C  2 gathers x N/2 ", mk_split(2), tb, ix_full, n_rows=N)
    chain_time("C  4 gathers x N/4 ", mk_split(4), tb, ix_full, n_rows=N)

    # ---------------- D: sorted vs random indices ----------------
    ix_sorted = jnp.asarray(
        np.sort(rng.integers(0, L, size=(N,))).astype(np.int32))
    chain_time("D  sorted idx      ", mk_gather(L), tb, ix_sorted, n_rows=N)
    del tb

    # ---------------- E: supercell select cost ----------------
    # (75^3, 128) gather measured 11.04 ns/row; add the 8-of-125 in-row
    # corner extraction. offs: (N, 8) lane offsets in [0, 125).
    L5 = 421_875
    tb5 = jax.random.normal(key, (L5, 128), jnp.float32)
    ix5 = jnp.asarray(rng.integers(0, L5, size=(N,)), jnp.int32)
    offs = jnp.asarray(rng.integers(0, 125, size=(N, 8)), jnp.int32)

    def mk_super(k):
        @jax.jit
        def f(tb, ix, offs):
            def body(i, carry):
                ix_, acc = carry
                rows = jnp.take(tb, ix_, axis=0)          # (N, 128)
                vals = jnp.take_along_axis(rows, offs, axis=1)  # (N, 8)
                s = jnp.sum(vals)
                ix2 = (ix_ + jnp.int32(1)
                       + (s * 0).astype(jnp.int32)) % L5
                return ix2, acc + s
            _, acc = lax.fori_loop(0, k, body, (ix, 0.0))
            return acc
        return f

    chain_time("E  supercell gather+select", mk_super, tb5, ix5, offs,
               n_rows=N)


if __name__ == "__main__":
    main()
