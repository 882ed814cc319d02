#!/usr/bin/env python
"""Per-stage breakdown of the ASCII gpt2 dedup encode path (the bench
path) on one [256, 8192] chunk: fused layout kernel -> word records ->
unique-buffer copy -> merge phases -> output expansion.

Each stage is a compiled prefix of the real pipeline inside a REPS-deep
fori_loop (input XORed with the loop index so nothing hoists); stage cost
= difference between consecutive rows.  See tools/profile_stages.py for
the non-ASCII variant and the timing-trap notes.
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
    z = jnp.zeros((REPS,), jnp.uint8)
    f = jax.jit(fn)
    t0 = time.perf_counter()
    _ = int(f(z, *args))
    compile_s = time.perf_counter() - t0
    best = 9e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = int(f(z, *args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:44s} {best*1e3:9.2f} ms/chunk   (compile {compile_s:.1f}s)",
          flush=True)
    return best


def loop(body):
    def fn(z, *args):
        def step(i, acc):
            return acc + body(z[i], *args)

        return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))

    return fn


def main():
    from tokenizers_tpu.ops import bpe_dedup as dd
    from tokenizers_tpu.ops import layout_pallas
    from tokenizers_tpu.ops.bpe_merge2 import _shift_next, run_merge_phases
    from tokenizers_tpu.ops.packing import pack_batch
    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file("/root/repo/tests/fixtures/gpt2/tokenizer.json")
    eng = tok._get_device_engine()
    text = open("/root/repo/tests/fixtures/corpus.txt", encoding="utf-8")
    data = text.read().encode("utf-8")
    docs = []
    off = 0
    while off + 8192 <= len(data) and len(docs) < 256:
        chunk = data[off : off + 8192]
        chunk = bytes(c if c < 128 else 32 for c in chunk)  # force ascii
        docs.append(chunk)
        off += len(chunk)
    chunks = pack_batch(docs)
    buf, lengths, _ = max(chunks, key=lambda c: c[0].size)
    print(f"chunk shape: {buf.shape}, bytes {int(lengths.sum())}", flush=True)
    d_buf = jax.device_put(buf)
    d_len = jax.device_put(lengths)
    kw = eng._program_args()
    byte2id = kw["byte2id"]
    rows0 = kw["merge_rows0"]
    rows1 = kw["merge_rows1"]
    mclr = kw["merge_mclr"]
    seed = kw["seed"]

    B, L = buf.shape
    BL = B * L
    geom = dd.buffer_geometry(BL)
    out_w = max(L // 2, 64)
    BIGP = jnp.int32(0x7FFFFFFF)

    use_fused = layout_pallas.supported((B, L))
    print(f"fused layout kernel: {use_fused}", flush=True)

    def prep(zi, bytes_u8, lengths):
        b = (bytes_u8 ^ zi).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        inb = pos < lengths[:, None]
        b = jnp.where(inb, b & 0x7F, 0)
        return b, pos, inb

    def stage_layout(zi, bytes_u8, lengths):
        b, pos, inb = prep(zi, bytes_u8, lengths)
        if use_fused:
            bnd, nxt_bnd, h1, h2 = layout_pallas.layout_fused(b, lengths)
        else:
            from tokenizers_tpu.ops.bpe_encode import gpt2_boundaries

            bnd, _ = gpt2_boundaries(b, inb, None, ascii_only=True)
            nbp = jax.lax.cummin(
                jnp.where(bnd, pos, BIGP), axis=1, reverse=True
            )
            nxt_bnd = _shift_next(nbp, BIGP)
            h1 = h2 = None
        return b, pos, inb, bnd, nxt_bnd, (h1, h2)

    def p0(zi, bytes_u8, lengths):
        b, pos, inb, bnd, nxt_bnd, hs = stage_layout(zi, bytes_u8, lengths)
        return jnp.sum(bnd.astype(jnp.int32)) + jnp.sum(nxt_bnd & 1)

    timeit("layout (boundaries + hashes)", loop(p0), d_buf, d_len)

    def upto_layout(zi, bytes_u8, lengths):
        b, pos, inb, bnd, nxt_bnd, hs = stage_layout(zi, bytes_u8, lengths)
        hashes = hs if use_fused else None
        fits, dops = dd.dedup_layout(
            b, bnd, inb, lengths, nxt_bnd, seed, geom, hashes=hashes
        )
        return b, fits, dops

    def p1(zi, bytes_u8, lengths):
        b, fits, dops = upto_layout(zi, bytes_u8, lengths)
        return jnp.sum(dops[2]) + fits.astype(jnp.int32)

    timeit("+ dedup_layout (records + election)", loop(p1), d_buf, d_len)

    def upto_ubuf(zi, bytes_u8, lengths):
        """Replicates dedup_finish up to (b_u, wid_u) (bpe_dedup.py)."""
        from tokenizers_tpu.ops.route import route_to

        b, fits, dops = upto_layout(zi, bytes_u8, lengths)
        (rep, in_buf, uoff, total_u, wpos_w, wlen_w, wvalid, nw,
         hit, ct0, ccnt, cslot, wh1, wh2) = dops
        nw_cap, wc, uc, uceff, ru = geom
        UFLAT = ru * uc
        urow = uoff // uceff
        ucol = uoff - urow * uceff
        uflat = urow * uc + ucol
        (delta0, wend0), uset = route_to(
            (wpos_w - uflat, uflat + wlen_w),
            in_buf,
            jnp.where(in_buf, uflat, 0),
            (0, 0),
            wrap=True,
            n_out=UFLAT,
        )
        uhead = uset.reshape(ru, uc)
        (delta, wend_f), dset = dd._fill_last(
            [delta0.reshape(ru, uc), wend0.reshape(ru, uc)], uhead
        )
        upos_f = (
            jax.lax.broadcasted_iota(jnp.int32, (ru, uc), 0) * uc
            + jax.lax.broadcasted_iota(jnp.int32, (ru, uc), 1)
        )
        src = jnp.clip(delta + upos_f, 0, BL - 1)
        inb_u = dset & (upos_f < wend_f)
        b_u = jnp.where(
            inb_u, b.reshape(-1)[src.reshape(-1)].reshape(ru, uc), 0
        )
        wid_u = jnp.where(
            inb_u,
            dd.g_excl_cumsum(uhead.astype(jnp.int32)) + uhead - 1,
            -1,
        )
        return b, dops, b_u, wid_u, inb_u

    def p2(zi, bytes_u8, lengths):
        b, dops, b_u, wid_u, inb_u = upto_ubuf(zi, bytes_u8, lengths)
        return jnp.sum(b_u) + jnp.sum(wid_u & 1)

    timeit("+ unique-buffer byte copy", loop(p2), d_buf, d_len)

    from tokenizers_tpu.ops.bpe_encode import take256

    def upto_merge(zi, bytes_u8, lengths):
        b, dops, b_u, wid_u, inb_u = upto_ubuf(zi, bytes_u8, lengths)
        ids0 = jnp.where(inb_u, take256(b_u, byte2id), -1)
        ids_u, wid_u2, bad_m, _ = run_merge_phases(
            ids0, wid_u, rows0, rows1, seed, mclr
        )
        return b, dops, ids_u, wid_u2, bad_m

    def p3(zi, bytes_u8, lengths):
        b, dops, ids_u, wid_u2, bad_m = upto_merge(zi, bytes_u8, lengths)
        return jnp.sum(jnp.where(ids_u >= 0, ids_u, 0)) + jnp.sum(
            bad_m.astype(jnp.int32)
        )

    timeit("+ merge phases", loop(p3), d_buf, d_len)

    def p4(zi, bytes_u8, lengths):
        b, dops, ids_u, wid_u2, bad_m = upto_merge(zi, bytes_u8, lengths)
        if getattr(bad_m, "ndim", 0) == 1 and bad_m.shape[0] == ids_u.shape[0]:
            bad_m = jnp.broadcast_to(bad_m[:, None], ids_u.shape)
        out = dd._finish_expand(
            ids_u, wid_u2, bad_m, dops, geom, (B, L), out_w, None
        )
        return jnp.sum(out[1])

    timeit("+ output expansion (full)", loop(p4), d_buf, d_len)

    def mk_sub(stage):
        def ps(zi, bytes_u8, lengths):
            b, dops, ids_u, wid_u2, bad_m = upto_merge(zi, bytes_u8, lengths)
            if getattr(bad_m, "ndim", 0) == 1 and (
                bad_m.shape[0] == ids_u.shape[0]
            ):
                bad_m = jnp.broadcast_to(bad_m[:, None], ids_u.shape)
            return dd._finish_expand(
                ids_u, wid_u2, bad_m, dops, geom, (B, L), out_w, None,
                stop_at=stage,
            )

        return ps

    for stage in ("segs", "stats", "stream", "gather", "offs", "route",
                  "fill"):
        timeit(f"  expand sub-stage: {stage}", loop(mk_sub(stage)),
               d_buf, d_len)

    def p5(zi, bytes_u8, lengths):
        b, fits, dops = upto_layout(zi, bytes_u8, lengths)
        ids_pk, ntok, bad = dd.dedup_finish(
            dops, b, byte2id, rows0, rows1, seed, mclr, out_w, geom
        )
        return jnp.sum(ntok) + jnp.sum(bad.astype(jnp.int32))

    timeit("REAL dedup_finish (incl merge slice)", loop(p5), d_buf, d_len)


if __name__ == "__main__":
    main()
