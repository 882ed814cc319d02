#!/usr/bin/env python
"""Microbenchmarks of the XLA:TPU primitives the encode path is built from.

Each primitive is timed inside one jitted program repeated REPS times via
lax.fori_loop (so per-dispatch overhead is amortized and the tunnel's
async-dispatch timing lies are avoided); completion is forced by fetching a
scalar reduction.  Prints one line per case: name, total elements touched,
ms per iteration, and derived M elements/s.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import tokenizers_tpu.ops  # noqa: F401  (enables persistent compile cache)

import jax
import jax.numpy as jnp

REPS = 20


def timeit(name, fn, *args, n_elems=None):
    f = jax.jit(fn)
    r = f(*args)
    _ = int(jnp.sum(r)) if r.ndim else int(r)  # warm compile + sync
    t0 = time.perf_counter()
    r = f(*args)
    _ = int(jnp.sum(r)) if r.ndim else int(r)
    dt = (time.perf_counter() - t0) / REPS
    rate = (n_elems / dt / 1e6) if n_elems else 0.0
    print(f"{name:44s} {dt*1e3:9.3f} ms/iter   {rate:10.1f} M/s", flush=True)


def loop(body):
    def fn(*args):
        def step(i, acc):
            return acc + body(i, *args)

        return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))

    return fn


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    BL = 1 << 21  # 2M, one bench chunk

    # ---- gathers: per-index cost vs table size ----
    for tbits in (8, 12, 16, 20):
        T = 1 << tbits
        table = jnp.arange(T, dtype=jnp.int32)
        idx = jax.random.randint(key, (256, BL // 256), 0, T, jnp.int32)

        def g(i, table, idx):
            return jnp.sum(table[(idx + i) & (T - 1)])

        timeit(f"gather  table=2^{tbits} idx={BL>>20}M", loop(g), table, idx, n_elems=BL)

    # gather of w-wide rows: does cost scale per index or per byte?
    T = 1 << 16
    idx = jax.random.randint(key, (256, BL // 256), 0, T, jnp.int32)
    for w in (2, 4, 8, 16):
        rows = jnp.zeros((T, w), jnp.int32)

        def gw(i, rows, idx):
            r = rows[(idx + i) & (T - 1)]
            return jnp.sum(r)

        timeit(
            f"gather{w} rows=2^16x{w} idx={BL>>20}M", loop(gw), rows, idx,
            n_elems=BL,
        )

    # ---- scatter: set with dump-slot pattern (the layout pattern) ----
    N = 1 << 20
    tgt = jax.random.randint(key, (BL,), 0, N + 1, jnp.int32)
    vals = jnp.ones((BL,), jnp.int32)

    def sc(i, tgt, vals):
        out = jnp.zeros((N + 1,), jnp.int32).at[tgt].set(vals + i)
        return jnp.sum(out[:16])

    timeit(f"scatter-set N=1M idx={BL>>20}M", loop(sc), tgt, vals, n_elems=BL)

    # scatter where most indices point at the dump slot (sparse-ish updates)
    tgt_sparse = jnp.where(tgt % 8 == 0, tgt, N)

    def scs(i, tgt, vals):
        out = jnp.zeros((N + 1,), jnp.int32).at[tgt].set(vals + i)
        return jnp.sum(out[:16])

    timeit("scatter-set 7/8 dump-slot", loop(scs), tgt_sparse, vals, n_elems=BL)

    # scatter-min (election pattern)
    def scm(i, tgt, vals):
        out = jnp.full((N + 1,), 0x7FFFFFFF, jnp.int32).at[tgt].min(vals + i)
        return jnp.sum(out[:16])

    timeit("scatter-min N=1M idx=2M", loop(scm), tgt, vals, n_elems=BL)

    # ---- elementwise / select chain over [256, 8192] ----
    x = jax.random.randint(key, (256, BL // 256), 0, 255, jnp.int32)

    def ew(i, x):
        y = x + i
        for _ in range(8):
            y = jnp.where(y > 128, y - 3, y + 1)
        return jnp.sum(y)

    timeit("8x select chain 2M", loop(ew), x, n_elems=BL * 8)

    # ---- associative scan over [256, 8192] (segmented-min shape) ----
    seg = x % 7 == 0

    def sc1(i, x, seg):
        def op(a, b):
            (v1, f1), (v2, f2) = a, b
            return jnp.where(f2, v2, jnp.minimum(v1, v2)), f1 | f2

        out, _ = jax.lax.associative_scan(op, (x + i, seg), axis=1)
        return jnp.sum(out)

    timeit("assoc-scan(min,seg) [256,8192]", loop(sc1), x, seg, n_elems=BL)

    # plain cumsum
    def cs(i, x):
        return jnp.sum(jnp.cumsum(x + i, axis=1))

    timeit("cumsum [256,8192]", loop(cs), x, n_elems=BL)

    # ---- one-hot matmul "gather" for a 256-entry int table ----
    tab256 = jnp.arange(256, dtype=jnp.float32)

    def oh(i, x, tab):
        onehot = jax.nn.one_hot((x + i) & 255, 256, dtype=jnp.bfloat16)
        v = onehot @ tab.astype(jnp.bfloat16)[:, None]
        return jnp.sum(v).astype(jnp.int32)

    timeit("onehot-matmul table=256 idx=2M", loop(oh), x, tab256, n_elems=BL)

    # ---- take_along_axis within rows (row-local gather) ----
    idx_row = jax.random.randint(key, (256, BL // 256), 0, BL // 256, jnp.int32)

    def ta(i, x, idx):
        return jnp.sum(jnp.take_along_axis(x, (idx + i) % (BL // 256), axis=1))

    timeit("take_along_axis row-local 2M", loop(ta), x, idx_row, n_elems=BL)

    # ---- fill_next / shift chain (merge-round adjacency recovery) ----
    from tokenizers_tpu.ops.bpe_merge2 import fill_next

    ids = jnp.where(x % 3 == 0, -1, x)

    def fn9(i, ids):
        (v,), fnd = fill_next([ids + i], ids >= 0, k_steps=9)
        return jnp.sum(v)

    timeit("fill_next k=9 [256,8192]", loop(fn9), ids, n_elems=BL)

    def fn3(i, ids):
        (v,), fnd = fill_next([ids + i], ids >= 0, k_steps=3)
        return jnp.sum(v)

    timeit("fill_next k=3 [256,8192]", loop(fn3), ids, n_elems=BL)

    # ---- butterfly compaction vs scatter compaction ----
    from tokenizers_tpu.ops.route import compact_left

    x2 = jax.random.randint(key, (256, BL // 256), -1, 255, jnp.int32)

    # NOTE: loop bodies must depend on i via ADDITION (x + i) — `x + i*0`
    # is algebraically simplified by XLA and the whole body gets hoisted
    # out of the fori_loop, timing an empty loop.
    def bc_row(i, x2):
        x = x2 + i
        (out,), cnt = compact_left((x,), x >= 0, (-1,))
        return jnp.sum(out) + jnp.sum(cnt)

    timeit("butterfly compact per-row [256,8192]", loop(bc_row), x2, n_elems=BL)

    def bc_wrap(i, x2):
        x = x2 + i
        (out,), cnt = compact_left((x,), x >= 0, (-1,), wrap=True)
        return jnp.sum(out) + cnt

    timeit("butterfly compact wrap [256,8192]", loop(bc_wrap), x2, n_elems=BL)

    def bc_wrap4(i, x2):
        x = x2 + i
        vals = (x, x2, x2, x2)
        out, cnt = compact_left(vals, x >= 0, (-1, -1, -1, -1), wrap=True)
        return jnp.sum(out[0]) + cnt

    timeit("butterfly compact wrap x4 arrays", loop(bc_wrap4), x2, n_elems=BL)

    def sc_compact(i, x2):
        x = x2 + i
        alive = x >= 0
        k = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
        rows_i = jax.lax.broadcasted_iota(jnp.int32, x2.shape, 0)
        W = x2.shape[1]
        tgt = jnp.where(alive, k, W)
        out = (
            jnp.full((x2.shape[0], W + 1), -1, jnp.int32)
            .at[rows_i, tgt]
            .set(x)[:, :W]
        )
        return jnp.sum(out)

    timeit("scatter compact per-row [256,8192]", loop(sc_compact), x2, n_elems=BL)

    # ---- one full merge round at two geometries ----
    from tokenizers_tpu.ops.bpe_merge2 import merge_round

    for shape in ((512, 1024), (128, 1024), (64, 512)):
        R, C = shape
        n = R * C
        wid = jnp.cumsum(jax.random.bernoulli(key, 0.2, (R, C)), axis=1).astype(
            jnp.int32
        )
        seg = wid != jnp.concatenate(
            [jnp.full((R, 1), -2, jnp.int32), wid[:, :-1]], axis=1
        )
        idsr = jax.random.randint(key, (R, C), 0, 255, jnp.int32)
        rows0 = jnp.zeros((1 << 16, 8), jnp.int32)
        rows1 = jnp.zeros((1 << 16, 8), jnp.int32)
        ol = jnp.zeros((R, C), jnp.int32)

        def mr(i, idsr, ol, wid, seg, rows0, rows1):
            out, _ol, _or, _f = merge_round(
                idsr + i, ol, ol, wid, seg, rows0, rows1, jnp.int32(1)
            )
            return jnp.sum(out)

        timeit(
            f"merge_round [{R},{C}]", loop(mr), idsr, ol, wid, seg, rows0,
            rows1, n_elems=n,
        )


if __name__ == "__main__":
    main()
