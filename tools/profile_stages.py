#!/usr/bin/env python
"""Per-stage breakdown of the gpt2 BPE encode program on one [256, 8192]
chunk of the bench corpus (the unit the bench runs 16x per 32MB batch).

Times cumulative prefixes of the pipeline so each stage's cost is the
difference between consecutive rows.  Every program is wrapped in a
REPS-iteration fori_loop and synced by a scalar fetch.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import tokenizers_tpu.ops  # noqa: F401

import jax
import jax.numpy as jnp

REPS = 5


def timeit(name, fn, *args):
    # zeros array threaded as runtime data: the loop body XORs z[i] into
    # the input so XLA cannot prove the body loop-invariant and hoist it
    # (it CAN fold i*0; PERF.md documents that trap)
    z = jnp.zeros((REPS,), jnp.uint8)
    f = jax.jit(fn)
    t0 = time.perf_counter()
    _ = int(f(z, *args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = int(f(z, *args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:40s} {dt*1e3:9.2f} ms/chunk   (compile {compile_s:.1f}s)", flush=True)
    return dt


def loop(body):
    def fn(z, *args):
        def step(i, acc):
            return acc + body(z[i], *args)

        return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))

    return fn


def main():
    from tokenizers_tpu.ops.bpe_dedup import (
        buffer_geometry,
        dedup_finish,
        dedup_layout,
    )
    from tokenizers_tpu.ops.bpe_encode import encode_program, gpt2_boundaries
    from tokenizers_tpu.ops.packing import pack_batch
    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file("/root/repo/tests/fixtures/gpt2/tokenizer.json")
    eng = tok._get_device_engine()
    text = open("/root/repo/tests/fixtures/corpus.txt", encoding="utf-8").read()
    data = text.encode("utf-8")
    print(f"corpus bytes: {len(data)}", flush=True)
    docs = []
    off = 0
    while off + 8192 <= len(data) and len(docs) < 256:
        chunk = data[off : off + 8192]
        while chunk and (chunk[-1] & 0xC0) == 0x80:
            chunk = chunk[:-1]
        if chunk and chunk[-1] >= 0xC0:
            chunk = chunk[:-1]
        docs.append(chunk)
        off += len(chunk)
    chunks = pack_batch(docs)
    # pack_batch buckets by (L, longword, ascii); take the big bench-shaped
    # bucket, not whatever tiny bucket sorts first
    buf, lengths, _ = max(chunks, key=lambda c: c[0].size)
    print(f"chunk shape: {buf.shape}, total bytes {int(lengths.sum())}", flush=True)
    d_buf = jax.device_put(buf)
    d_len = jax.device_put(lengths)
    kw = eng._program_args()

    B, L = buf.shape
    BL = B * L
    geom = buffer_geometry(BL)
    geom_small = buffer_geometry(BL, denom=16)

    def prep(zi, bytes_u8, lengths):
        b = (bytes_u8 ^ zi).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        inb = pos < lengths[:, None]
        b = jnp.where(inb, b, 0)
        return b, pos, inb

    cls_table = kw["cls_table"]
    byte2id = kw["byte2id"]
    rows0 = kw["merge_rows0"]
    rows1 = kw["merge_rows1"]
    mclr = kw["merge_mclr"]
    seed = kw["seed"]

    # stage 1: boundaries (includes the cls gather)
    def p1(i, bytes_u8, lengths):
        b, pos, inb = prep(i, bytes_u8, lengths)
        bnd, _ = gpt2_boundaries(b, inb, cls_table)
        return jnp.sum(bnd.astype(jnp.int32))

    timeit("boundaries (incl cls gather)", loop(p1), d_buf, d_len)

    # stage 2: + word guard + dedup layout
    BIGP = jnp.int32(0x7FFFFFFF)

    def upto_layout(i, bytes_u8, lengths, geom):
        from tokenizers_tpu.ops.bpe_merge2 import WORD_CAP, _shift_next

        b, pos, inb = prep(i, bytes_u8, lengths)
        bnd, _ = gpt2_boundaries(b, inb, cls_table)
        nbp = jax.lax.cummin(jnp.where(bnd, pos, BIGP), axis=1, reverse=True)
        nxt_bnd = _shift_next(nbp, BIGP)
        fits, dops = dedup_layout(b, bnd, inb, lengths, nxt_bnd, seed, geom)
        return b, bnd, inb, nxt_bnd, fits, dops

    def p2(i, bytes_u8, lengths):
        *_rest, fits, dops = upto_layout(i, bytes_u8, lengths, geom)
        return jnp.sum(dops[2]) + fits.astype(jnp.int32)

    timeit("+ dedup_layout", loop(p2), d_buf, d_len)

    # stage 3: + dedup_finish with merge disabled (layout + copy + expand)
    import tokenizers_tpu.ops.bpe_dedup as dd

    real_merge = dd.run_merge_phases

    def fake_merge(ids, wid, r0, r1, s, m, phase1_rounds=4, obp=None):
        w2 = max(ids.shape[1] // 2, 64)
        from tokenizers_tpu.ops.bpe_merge2 import compact

        ids2, wid2, bad, _ = compact(ids, wid, w2)
        return ids2, wid2, bad, None

    def p3(i, bytes_u8, lengths):
        b, bnd, inb, nxt_bnd, fits, dops = upto_layout(i, bytes_u8, lengths, geom)
        out = dedup_finish(dops, b, byte2id, rows0, rows1, seed, mclr, L // 2, geom)
        return jnp.sum(out[1])

    dd.run_merge_phases = fake_merge
    timeit("+ finish (merge stubbed to compact)", loop(p3), d_buf, d_len)
    dd.run_merge_phases = real_merge

    # count merge rounds on the full grid after 4 phase-1 rounds
    def p_count(bytes_u8, lengths):
        from tokenizers_tpu.ops.bpe_merge2 import (
            _seg_of,
            compact,
            init_own,
            merge_round,
        )

        b, bnd, inb, nxt_bnd, fits, dops = upto_layout(0, bytes_u8, lengths, geom)
        ids0 = jnp.where(inb, byte2id[b], -1)
        wid = jnp.where(inb, jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1, -1)
        seg = _seg_of(wid)
        ol, orr = init_own(ids0, mclr)
        for r in range(4):
            ids0, ol, orr, _ = merge_round(
                ids0, ol, orr, wid, seg, rows0, rows1, seed, k_steps=r + 1
            )
        w2 = max(L // 2, 64)
        ids0, wid2, bad, (ol, orr) = compact(ids0, wid, w2, (ol, orr))
        seg2 = _seg_of(wid2)

        def cond(state):
            return state[3]

        def body(state):
            ids, ol, orr, _, n = state
            ids, ol, orr, more = merge_round(
                ids, ol, orr, wid2, seg2, rows0, rows1, seed
            )
            return ids, ol, orr, jnp.any(more), n + 1

        def cond2(state):
            return state[3]

        _, _, _, _, n = jax.lax.while_loop(
            cond2, body, (ids0, ol, orr, jnp.array(True), jnp.int32(0))
        )
        return n

    n = int(jax.jit(p_count)(d_buf, d_len))
    print(f"while-loop merge rounds after 4 phase-1 rounds (full grid): {n}", flush=True)

    # stage 4: full program (no cache) as the bench runs it.  The input
    # MUST depend on the loop index or XLA hoists the whole encode out of
    # the fori_loop and the number is fiction.
    def p4(zi, bytes_u8, lengths):
        b_i = bytes_u8 ^ zi
        ids, ntok, bad = encode_program(b_i, lengths, **kw)
        return jnp.sum(ntok)

    timeit("full encode_program (bench config)", loop(p4), d_buf, d_len)

    # stage 5: single merge_round cost at the two unique-buffer geometries
    for g, nm in ((geom, "denom4"), (geom_small, "denom16")):
        nw_cap, wc, uc, uceff, ru = g
        from tokenizers_tpu.ops.bpe_merge2 import _seg_of, merge_round

        key = jax.random.PRNGKey(0)
        wid = jnp.cumsum(
            jax.random.bernoulli(key, 0.2, (ru, uc)), axis=1
        ).astype(jnp.int32)
        seg = _seg_of(wid)
        idsr = jax.random.randint(key, (ru, uc), 0, 255, jnp.int32)
        olz = jnp.zeros((ru, uc), jnp.int32)

        def mr(zi, idsr, olz, wid, seg):
            out, _l, _r, _f = merge_round(
                idsr ^ zi.astype(jnp.int32), olz, olz, wid, seg,
                rows0, rows1, seed
            )
            return jnp.sum(out)

        dt = timeit(
            f"merge_round on ubuf {nm} [{ru},{uc}]", loop(mr), idsr, olz,
            wid, seg,
        )

    # end-to-end un-jitted overhead: dispatch 16 chunks w/ final sync
    def run16():
        acc = jnp.int32(0)
        for _ in range(16):
            ids, ntok, bad = encode_program(d_buf, d_len, **kw)
            acc = acc + jnp.sum(ntok)
        return int(acc)

    run16()
    t0 = time.perf_counter()
    run16()
    dt = time.perf_counter() - t0
    tot = int(lengths.sum()) * 16
    print(
        f"16-chunk dispatch loop: {dt*1e3:.1f} ms total -> {tot/dt/1e6:.1f} MB/s",
        flush=True,
    )

    # the bench's actual configuration: ONE scan dispatch over 16 chunks
    from tokenizers_tpu.ops.bpe_encode import encode_program_scan

    bufs16 = jnp.stack([d_buf] * 16)
    lens16 = jnp.stack([d_len] * 16)
    ascii_only = bool(np.asarray(buf).max(initial=0) < 128)

    def run_scan(cache):
        if cache:
            st = eng._ensure_cache()
            ids, ntok, bad, st2 = encode_program_scan(
                bufs16, lens16, cache_rows=st[0], cache_buf=st[1],
                cache_p=st[2], ascii_only=ascii_only, **kw
            )
            eng._wc = list(st2)
        else:
            ids, ntok, bad, _ = encode_program_scan(
                bufs16, lens16, ascii_only=ascii_only, word_cache=False, **kw
            )
        return int(jnp.sum(ntok))

    for cache in (False, True):
        run_scan(cache)
        t0 = time.perf_counter()
        run_scan(cache)
        dt = time.perf_counter() - t0
        print(
            f"scan-16 program (cache={cache}): {dt*1e3:.1f} ms"
            f" -> {tot/dt/1e6:.1f} MB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
