"""Round-5 probe: is 13.2 ns/row the hardware's gather floor, or XLA's?

VERDICT r4 #1: the SDF corner-row gather (3.3M rows/step, 43.7 ms, 64% of
the LM step) is the last lever on the headline. This script measures every
candidate replacement on the real chip:

  A  baseline: packed (27M, 8) f32 row gather at the bench query count
  B  row-count sweep: same query count, tables from 4k to 27M rows —
     separates the per-query issue floor from table-size (TLB) overhead
  C  row-width sweep: is the cost per ROW (width-independent) or per byte
  D  supercell 2^3 repack: (150^3, 32)-row table (27 corner values per
     2x2x2 cell block), gather ONE wider row per query + in-register
     8-of-27 corner select (pure VPU select-sums)
  E  supercell 4^3 repack: (75^3, 128)-row table (125 corners per 4x4x4
     block) — fewest rows, widest unpack
  F  hand-rolled Pallas DMA gather: scalar-prefetched indices, DEPTH-deep
     pipelined async HBM->VMEM row copies — measures the raw per-descriptor
     DMA issue rate the "do it by hand" theory depends on
  G  sort decomposition: argsort + sorted-index gather + inverse-permute
     (the unpermute is itself a gather of the output rows)

Timing: chained-K dependent iterations inside one jit returning a scalar,
(T_K - T_1)/(K-1) — the only honest device timing over this tunnel
(CLAUDE.md measurement rules).
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

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B = int(os.environ.get("B", "2048"))
    K = int(os.environ.get("K", "4"))
    N = B * 101 * 16  # bench query count (3,309,568 at B=2048)
    rng = np.random.default_rng(0)
    print(f"device {jax.devices()[0]}  N={N}", flush=True)

    def chain_time(label, make_fn, *args, reps=3, n_rows=N):
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

    def mk_gather(table, nrows):
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

    # ---------- A. baseline: bench-shape packed table ----------
    L_FULL = 300 * 300 * 300
    key = jax.random.PRNGKey(0)
    full = jax.random.normal(key, (L_FULL, 8), jnp.float32)
    idx_full = jnp.asarray(rng.integers(0, L_FULL, size=(N,)), jnp.int32)
    chain_time(f"A  (27M, 8) f32 gather", mk_gather(full, L_FULL),
               full, idx_full)

    # ---------- B. row-count sweep (width 8) ----------
    for L in (4096, 65536, 421_875, 3_375_000):
        tb = jax.random.normal(key, (L, 8), jnp.float32)
        idx = jnp.asarray(rng.integers(0, L, size=(N,)), jnp.int32)
        chain_time(f"B  ({L:>9}, 8) gather", mk_gather(tb, L), tb, idx)

    # ---------- C. row-width sweep ----------
    for L, W in ((3_375_000, 32), (421_875, 32), (421_875, 128)):
        tb = jax.random.normal(key, (L, W), jnp.float32)
        idx = jnp.asarray(rng.integers(0, L, size=(N,)), jnp.int32)
        chain_time(f"C  ({L:>9}, {W:>3}) gather", mk_gather(tb, L), tb, idx)

    # bf16 width variants (half the bytes per row)
    for L, W in ((3_375_000, 32), (421_875, 128)):
        tb = jax.random.normal(key, (L, W), jnp.float32).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, L, size=(N,)), jnp.int32)
        chain_time(f"C  ({L:>9}, {W:>3}) bf16  ", mk_gather(tb, L), tb, idx)

    # ---------- D. supercell 2^3 end-to-end ----------
    # table (150^3, 32): 27 corner values of each 2x2x2 cell block (+pad).
    # per query: one row gather + select 8 of 27 columns by the cell's
    # in-block offset (8 possible base offsets) -> 8*8 select-sum terms.
    L2 = 150 ** 3
    tb2 = jax.random.normal(key, (L2, 32), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, L2, size=(N,)), jnp.int32)
    boff2 = jnp.asarray(rng.integers(0, 8, size=(N,)), jnp.int32)
    OFFS2 = (0, 1, 3, 4, 9, 10, 12, 13)  # (oz*9 + oy*3 + ox) for {0,1}^3

    def mk_super2(k):
        @jax.jit
        def f(tb, idx, boff):
            def body(i, carry):
                idx_, acc = carry
                rows = jnp.take(tb, idx_, axis=0)  # (N, 32)
                masks = [(boff == v).astype(rows.dtype) for v in OFFS2]
                s = 0.0
                for ck in OFFS2:  # 8 corners
                    val = sum(m * rows[:, v + ck]
                              for m, v in zip(masks, OFFS2))
                    s = s + jnp.sum(val)
                idx2_ = (idx_ + jnp.int32(1)
                         + (s * 0).astype(jnp.int32)) % L2
                return idx2_, acc + s
            _, acc = lax.fori_loop(0, k, body, (idx, 0.0))
            return acc
        return f

    chain_time("D  supercell2 gather+unpack", mk_super2, tb2, idx2, boff2)

    # ---------- E. supercell 4^3 end-to-end ----------
    L4 = 75 ** 3
    tb4 = jax.random.normal(key, (L4, 128), jnp.float32)
    idx4 = jnp.asarray(rng.integers(0, L4, size=(N,)), jnp.int32)
    boff4 = jnp.asarray(rng.integers(0, 64, size=(N,)), jnp.int32)
    OFFS4_BASE = tuple(oz * 25 + oy * 5 + ox
                       for oz in range(4) for oy in range(4)
                       for ox in range(4))
    OFFS4_CORNER = (0, 1, 5, 6, 25, 26, 30, 31)

    def mk_super4(k):
        @jax.jit
        def f(tb, idx, boff):
            def body(i, carry):
                idx_, acc = carry
                rows = jnp.take(tb, idx_, axis=0)  # (N, 128)
                masks = [(boff == v).astype(rows.dtype)
                         for v in OFFS4_BASE]
                s = 0.0
                for ck in OFFS4_CORNER:
                    val = sum(m * rows[:, v + ck]
                              for m, v in zip(masks, OFFS4_BASE))
                    s = s + jnp.sum(val)
                idx2_ = (idx_ + jnp.int32(1)
                         + (s * 0).astype(jnp.int32)) % L4
                return idx2_, acc + s
            _, acc = lax.fori_loop(0, k, body, (idx, 0.0))
            return acc
        return f

    chain_time("E  supercell4 gather+unpack", mk_super4, tb4, idx4, boff4)

    # ---------- F. Pallas DMA row gather ----------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N_DMA = int(os.environ.get("NDMA", "65536"))
    CHUNK = N_DMA // 2
    DEPTH = 16

    def dma_kernel(idx_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)

        def dma(q, slot):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i * CHUNK + q]],
                out_ref.at[q],
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
        grid=(N_DMA // CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (CHUNK, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
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
            _, acc = lax.fori_loop(0, k, body, (idx, 0.0))
            return acc
        return f

    try:
        chain_time(f"F  pallas DMA gather (N={N_DMA})", mk_dma,
                   idx_dma, full, n_rows=N_DMA)
    except Exception as e:  # noqa: BLE001 — probe must report, not die
        print(f"F  pallas DMA gather FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}", flush=True)

    # XLA reference at the same small N
    chain_time(f"F' XLA gather      (N={N_DMA})",
               mk_gather(full, L_FULL), full, idx_dma, n_rows=N_DMA)

    # ---------- G. sort decomposition ----------
    def mk_sort(k):
        @jax.jit
        def f(idx):
            def body(i, carry):
                idx_, acc = carry
                perm = jnp.argsort(idx_)
                s = jnp.sum(perm[:8])
                return (idx_ + jnp.int32(1)
                        + (s * 0).astype(jnp.int32)) % L_FULL, acc + s
            _, acc = lax.fori_loop(0, k, body, (idx, jnp.int32(0)))
            return acc
        return f

    chain_time("G  argsort(3.3M) alone", mk_sort, idx_full)

    idx_sorted = jnp.sort(idx_full)
    chain_time("G  gather with SORTED idx", mk_gather(full, L_FULL),
               full, idx_sorted)

    # unpermute of the (N, 8) result rows — itself a gather on a small
    # table; the floor cost any sorted scheme must additionally pay
    out_rows = jnp.take(full, idx_sorted[:N], axis=0)
    perm_idx = jnp.asarray(rng.permutation(N), jnp.int32)
    chain_time("G  unpermute (N,8) output", mk_gather(out_rows, N),
               out_rows, perm_idx)


if __name__ == "__main__":
    main()
