"""Batch word-dedup BPE encode: merge each distinct word once.

Natural text repeats words heavily (a 2MB batch has ~400k pre-tokenizer
words but typically only 15-25% distinct), and BPE is a pure per-word
function, so the merge loop — whose cost on this backend is dominated by
per-index gather/scatter throughput (~140M idx/s measured) — only needs to
run over the *unique* words.  This is the batched equivalent of the
reference's per-word memo cache (`utils/cache.rs`, used at
`models/bpe/model.rs:475-497`), done in one device program:

  1. `dedup_layout` (always runs, cheap): per-word double rolling hashes
     via segmented scans, one scatter packing word records
     `[flat_pos, h1, h2, len]` into a word table, a scatter-min hash table
     electing the first occurrence of each (h1, h2) as representative, and
     the unique-buffer offsets.  Produces the `fits` predicate.
  2. `dedup_finish` (the `lax.cond` fast branch): copy representative
     bytes into the small unique buffer, run the ordinary
     `run_merge_phases` there at a fraction of the width, then expand
     tokens back to the packed per-row output.

TPU shape discipline: every large intermediate is 2D with a few-thousand-
element minor axis — a single giant row serializes the associative scans
and wastes the (8, 128) vector tiling (measured 3x slower).  The unique
buffer is `[Ru, UC]` with words placed at `(uoff // UCEFF, uoff % UCEFF)`;
the `UC - UCEFF = WORD_CAP` slack guarantees no word crosses a row, with
only ~13% slot bloat and no sequential bin-packing.  Global cumulative
sums over 2D arrays are per-row scans plus a tiny row-offset scan
(`g_excl_cumsum`).

Word identity is two independent 32-bit rolling hashes; two distinct words
collide with probability ~2^-64 per pair (~1e-9 across a 2MB batch) — the
same truncated-fingerprint tradeoff the whole-word `ignore_merges` table
already makes.

When `fits` is false (CJK or random bytes where nearly every word is
distinct, or pathologically many tiny words), the caller's other branch
runs the full-width merge — same cost as before this optimization.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_merge2 import WORD_CAP, fill_next, run_merge_phases
from .merge_table import hash_jnp

INF = np.int32(0x7FFFFFFF)
H1_MULT = np.uint32(0x01000193)
H2_MULT = np.uint32(0x0000C597)


def buffer_geometry(bl, denom=None):
    """Static sizes: word-table [Wr, Wc] and unique buffer [Ru, UC].

    `denom` scales the unique-buffer capacity (~bl/denom bytes); the word
    table is always sized for bl/4 words so `dedup_layout` results can be
    shared between buffer sizes.

    Default denom is occupancy-aware: 8 (12.5% of chunk bytes) at bench
    scale — every merge round runs over the whole [Ru, UC] buffer, so
    capacity is round cost, and measured worst-case unique-word bytes on
    2MB chunks are 6.8% (bench corpus) / 8.4% (word-shuffled, killing
    cross-row dedup) — but 4 for small (<1M-position) chunks, where
    cross-row dedup is weak (a 16-doc chunk measured ~50% unique bytes)
    and capacity, not round cost, dominates.  Chunks that overflow
    (dedup-poor text) cascade to the denom=2 big branch / host."""
    if denom is None:
        denom = 8 if bl >= (1 << 20) else 4
    raw = max(bl // 4, 1 << 10)
    wc = min(4096, 1 << (raw.bit_length() - 1))
    nw_cap = -(-raw // wc) * wc
    uraw = max(bl // denom, 1 << 10)
    uc = min(4096, 1 << (uraw.bit_length() - 1))
    uceff = uc - min(WORD_CAP, uc // 2)
    ru = -(-uraw // uceff)
    return nw_cap, wc, uc, uceff, ru


def g_excl_cumsum(x):
    """Global (row-major) exclusive cumulative sum of a 2D int array."""
    r = jnp.cumsum(x, axis=1)
    tot = r[:, -1]
    roff = jnp.cumsum(tot) - tot
    return r - x + roff[:, None]


def _fill_last(vals, isset):
    """Per position (per row): the last values at-or-before it where
    `isset`, plus the set flag.  Values may be any int32."""

    def op(a, b):
        s1 = a[-1]
        s2 = b[-1]
        return tuple(
            jnp.where(s2, vb, va) for va, vb in zip(a[:-1], b[:-1])
        ) + (s1 | s2,)

    args = tuple(jnp.where(isset, v, 0) for v in vals) + (isset,)
    out = jax.lax.associative_scan(op, args, axis=1)
    return out[:-1], out[-1]


def _seg_count_op(a, b):
    (v1, f1), (v2, f2) = a, b
    return jnp.where(f2, v2, v1 + v2), f1 | f2


def _fill_last_wrap(vals, isset):
    """Row-major (global) `_fill_last` over a [R, C] array: per position,
    the last value at-or-before it IN ROW-MAJOR ORDER where `isset` (0
    where none).  One per-row scan + a [R]-sized cross-row carry — for
    segments that span table-row boundaries (e.g. an output row's words
    wrapping across word-table rows)."""
    vr, sr = _fill_last(vals, isset)
    lastv = [v[:, -1] for v in vr]
    lasts = sr[:, -1]

    def op(a, b):
        s2 = b[-1]
        return tuple(
            jnp.where(s2, vb, va) for va, vb in zip(a[:-1], b[:-1])
        ) + (a[-1] | s2,)

    # exclusive cross-row carry: last set value among rows < r
    sh = tuple(
        jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]]) for v in lastv
    )
    sh_s = jnp.concatenate([jnp.zeros((1,), bool), lasts[:-1]])
    out = jax.lax.associative_scan(
        op, tuple(jnp.where(sh_s, v, 0) for v in sh) + (sh_s,), axis=0
    )
    carry_v, carry_s = out[:-1], out[-1]
    filled = tuple(
        jnp.where(sr, v, cv[:, None]) for v, cv in zip(vr, carry_v)
    )
    return filled, sr | carry_s[:, None]


def word_hash_heads(b, bnd, inb, mult):
    """Rolling hash of each word, delivered at the word's head position.

    A forward segmented affine scan puts the full hash at the word's last
    byte; a log fill copies it back to the head (words longer than
    WORD_CAP are flagged row_bad upstream and re-encoded on host)."""
    B, L = b.shape

    def op(x, y):
        (a1, c1, f1), (a2, c2, f2) = x, y
        a = jnp.where(f2, a2, a1 * a2)
        c = jnp.where(f2, c2, c1 * a2 + c2)
        return a, c, f1 | f2

    a0 = jnp.full((B, L), mult, jnp.uint32)
    c0 = (b + 1).astype(jnp.uint32)
    _, h, _ = jax.lax.associative_scan(op, (a0, c0, bnd), axis=1)

    nxt_in = jnp.concatenate([inb[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    nxt_head = jnp.concatenate([bnd[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    is_end = inb & (nxt_head | ~nxt_in)
    (he,), fnd = fill_next([h.astype(jnp.int32)], is_end, k_steps=9)
    return jnp.where(is_end, h.astype(jnp.int32), jnp.where(fnd, he, 0))


def dedup_layout(b, bnd, inb, lengths, nxt_bnd, seed, geom, cache=None,
                 hashes=None, max_wlen=None):
    """Word records, representative election, unique-buffer layout.

    `cache`: optional (cache_rows [Sc, 4], reset bool scalar) — the
    persistent word cache; cached words are excluded from the merge
    buffer entirely.

    `hashes`: optional precomputed (h1, h2) head-delivered word hashes
    (the fused Pallas layout kernel, layout_pallas.py).

    `max_wlen` (static): words longer than this are excluded from the
    unique buffer (and from cache hits — their truncated rolling hashes
    are unreliable) instead of corrupting the row-slack layout; they get
    zero device tokens and surface as per-word patch records
    (`_finish_expand` patch_cap) for host re-encoding, so ONE long word
    no longer poisons its whole input row.

    Returns (fits, ops) where `ops` is the operand tuple for
    `dedup_finish`."""
    nw_cap, wc, uc, uceff, ru = geom
    wr = nw_cap // wc
    B, L = b.shape
    BL = B * L
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)

    wend = jnp.minimum(nxt_bnd, lengths[:, None])
    wlen = wend - pos
    if hashes is not None:
        h1, h2 = hashes
    else:
        h1 = word_hash_heads(b, bnd, inb, H1_MULT)
        h2 = word_hash_heads(b, bnd, inb, H2_MULT)
    fpos = pos + rowi * L

    nw = jnp.sum(bnd.astype(jnp.int32))

    # word records packed in order by a wrap butterfly compaction (a flat
    # scatter costs ~5.4ns/index on this backend; the butterfly ~8x less),
    # then row-major reshaped into the [wr, wc] word table
    from .route import compact_left

    (c_fpos, c_h1, c_h2, c_wlen), _cnt = compact_left(
        (fpos, h1, h2, wlen), bnd & inb, (0, -1, -1, 0), wrap=True
    )

    def to_wtab(x):
        flat = x.reshape(-1)
        if flat.shape[0] < nw_cap:
            flat = jnp.concatenate(
                [flat, jnp.zeros((nw_cap - flat.shape[0],), x.dtype)]
            )
        return flat[:nw_cap].reshape(wr, wc)

    widx2 = (
        jax.lax.broadcasted_iota(jnp.int32, (wr, wc), 0) * wc
        + jax.lax.broadcasted_iota(jnp.int32, (wr, wc), 1)
    )
    wvalid = widx2 < nw
    wpos_w = to_wtab(c_fpos)
    wh1 = jnp.where(wvalid, to_wtab(c_h1), -1)
    wh2 = jnp.where(wvalid, to_wtab(c_h2), -1)
    wlen_w = jnp.where(wvalid, to_wtab(c_wlen), 0)

    S = 1 << max(14, int(nw_cap - 1).bit_length())
    slot = hash_jnp(wh1, wh2, seed ^ 0x5BD1, S - 1, 0)
    slot = jnp.where(wvalid, slot, S).reshape(-1)
    # +8 (not +1) dump tail so the read back is a width-8 ROW gather
    tbl = jnp.full((S + 8,), INF, jnp.int32).at[slot].min(widx2.reshape(-1))
    from .merge_table import take_row8

    winner = take_row8(slot, tbl).reshape(wr, wc)
    # winner's (h1, h2) via one row-gather over the re-assembled records;
    # rows padded to width 4 — narrow (2/3-wide) row gathers miss the
    # aligned fast path on this backend (r5: the width-3 `pair` gather in
    # _finish_expand measured ~3x the width-4 form)
    z2 = jnp.zeros((nw_cap, 2), jnp.int32)
    wrows2 = jnp.concatenate(
        [wh1.reshape(-1, 1), wh2.reshape(-1, 1), z2], axis=-1
    )  # [nw_cap, 4]
    wrow_win = wrows2[jnp.clip(winner, 0, nw_cap - 1).reshape(-1)].reshape(
        wr, wc, 4
    )
    same = (
        wvalid
        & (winner < nw_cap)
        & (wrow_win[..., 0] == wh1)
        & (wrow_win[..., 1] == wh2)
    )
    rep = jnp.where(same, winner, widx2)
    is_rep = wvalid & (rep == widx2)

    if cache is None:
        hit = jnp.zeros((wr, wc), bool)
        ct0 = jnp.zeros((wr, wc), jnp.int32)
        ccnt = jnp.zeros((wr, wc), jnp.int32)
        cslot = jnp.zeros((wr, wc), jnp.int32)
    else:
        # persistent cross-batch word cache: (h1, h2, tok_start, tok_count)
        # rows in a direct-mapped table over the same engine seed (stable
        # across batches).  `reset` voids all hits (in-graph epoch reset).
        crows, reset = cache
        Sc = crows.shape[0]
        cslot = hash_jnp(wh1, wh2, seed ^ 0x9E37, Sc - 1, 0)
        crow = crows[cslot]
        hit = (
            wvalid
            & ~reset
            & (crow[..., 0] == wh1)
            & (crow[..., 1] == wh2)
        )
        ct0 = crow[..., 2]
        ccnt = crow[..., 3]

    if max_wlen is not None:
        long_w = wvalid & (wlen_w > max_wlen)
        hit = hit & ~long_w
    else:
        long_w = jnp.zeros((wr, wc), bool)

    in_buf = is_rep & ~hit & ~long_w  # uncached representatives get merged
    ulen = jnp.where(in_buf, wlen_w, 0)
    uoff = g_excl_cumsum(ulen)
    total_u = jnp.sum(ulen)
    fits = (nw <= nw_cap) & (total_u <= uceff * ru)

    ops = (
        rep,
        in_buf,
        uoff,
        total_u,
        wpos_w,
        wlen_w,
        wvalid,
        nw,
        hit,
        ct0,
        ccnt,
        cslot,
        wh1,
        wh2,
    )
    return fits, ops


def layout_fits(ops, geom):
    """Whether a layout's words/unique bytes fit a (possibly smaller)
    buffer geometry sharing the same word-table shape."""
    nw_cap, _wc, _uc, uceff, ru = geom
    total_u = ops[3]
    nw = ops[7]
    return (nw <= nw_cap) & (total_u <= uceff * ru)


def dedup_finish(
    ops,
    b,
    byte2id,
    rows0,
    rows1,
    seed,
    mclr,
    out_w,
    geom,
    whole_word=False,
    ww_rows0=None,
    ww_rows1=None,
    ww_seed=0,
    cache_state=None,
    encode_fn=None,
    ladder_depth=2,
    max_wlen=None,
    patch_cap=0,
    stop_at=None,
):
    """The fast branch: encode unique words, expand to per-row output.

    `cache_state`: optional (crows [Sc, 4], cbuf [CAP+1], p scalar) — the
    persistent word cache, already epoch-reset by the caller.  Newly merged
    words are appended to `cbuf` and registered in `crows` (direct-mapped,
    last-writer-wins; slot-collision losers simply stay uncached), and the
    output expansion reads every word's tokens from `cbuf`.

    `encode_fn(b_u, uhead, inb_u, wid_u, wend_f, upos_f) -> (ids, wid2,
    bad)`: the per-unique-word encoder over the [ru, uc] buffer (tokens
    alive where ids >= 0, same wid layout).  Defaults to the byte-level
    BPE merge; the WordPiece engine passes its longest-match encoder so
    WordPiece shares the dedup/expansion/cache machinery
    (`wordpiece_dedup.py`).

    Returns (ids[B, out_w], ntok[B], row_bad[B]) and, when caching,
    (crows', cbuf', p')."""
    nw_cap, wc, uc, uceff, ru = geom
    wr = nw_cap // wc
    (
        rep,
        in_buf,
        uoff,
        total_u,
        wpos_w,
        wlen_w,
        wvalid,
        nw,
        hit,
        ct0,
        ccnt,
        cslot,
        wh1,
        wh2,
    ) = ops
    B, L = b.shape
    BL = B * L
    UFLAT = ru * uc

    def _stopf(val):
        """Profiling early-exit (tools/profile_scan.py): checksum rides out
        in ntok with the REAL output signature so the surrounding cond/
        scan structure compiles unchanged."""
        r = (
            jnp.zeros((B, out_w), jnp.int32),
            jnp.full((B,), val.astype(jnp.int32), jnp.int32),
            jnp.zeros((B,), bool),
        )
        if patch_cap:
            r = r + (jnp.zeros((patch_cap, 5), jnp.int32), jnp.int32(0))
        if cache_state is not None:
            return r, cache_state
        return r

    # ---- unique byte buffer [ru, uc] ---------------------------------
    urow = uoff // uceff
    ucol = uoff - urow * uceff
    uflat = urow * uc + ucol
    if UFLAT % wc == 0:
        # targets are strictly increasing over in_buf words (uflat is a
        # strictly increasing function of the running unique offset), so
        # the head records move by a wrap butterfly route — measured ~7x
        # cheaper than the flat scatter at bench scale (23.7 -> 3.5 ms
        # per 512K records on this backend; PERF.md)
        from .route import route_to

        (delta0, wend0), uset = route_to(
            (wpos_w - uflat, uflat + wlen_w),
            in_buf,
            jnp.where(in_buf, uflat, 0),
            (0, 0),
            wrap=True,
            n_out=UFLAT,
        )
        uhead = uset.reshape(ru, uc)
        d0 = delta0.reshape(ru, uc)
        w0 = wend0.reshape(ru, uc)
    else:  # odd geometries: the flat scatter
        utgt = jnp.where(in_buf, jnp.minimum(uflat, UFLAT), UFLAT).reshape(-1)
        head_rec = jnp.stack(
            [
                (wpos_w - uflat).reshape(-1),
                (uflat + wlen_w).reshape(-1),
                jnp.ones(nw_cap, jnp.int32),
            ],
            axis=-1,
        )
        head_scat = (
            jnp.full((UFLAT + 1, 3), -1, jnp.int32)
            .at[utgt]
            .set(head_rec)[:UFLAT]
        )
        uhead = (head_scat[:, 2] == 1).reshape(ru, uc)
        d0 = head_scat[:, 0].reshape(ru, uc)
        w0 = head_scat[:, 1].reshape(ru, uc)
    (delta, wend_f), dset = _fill_last([d0, w0], uhead)
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
        inb_u, g_excl_cumsum(uhead.astype(jnp.int32)) + uhead - 1, -1
    )
    if stop_at == "ubuf":
        return _stopf(jnp.sum(b_u) + jnp.sum(wid_u & 1))

    # ---- encode it ----------------------------------------------------
    if encode_fn is not None:
        # Occupancy tiers (r5): unique words pack densely from row 0 and
        # the encoder costs the WHOLE buffer slice it runs on (probe
        # sweep + DP/chain), but capacity is sized for the worst case —
        # typical occupancy is a fraction, and with the persistent word
        # cache later chunks carry only NEW words (steady-state serving:
        # a few %).  Run the encoder on the smallest static row slice the
        # unique bytes fit (ru/8, ru/2, full); pad the dead rows back.
        def _enc_sliced(ru_s):
            def run(_):
                r = encode_fn(
                    b_u[:ru_s], uhead[:ru_s], inb_u[:ru_s], wid_u[:ru_s],
                    wend_f[:ru_s], upos_f[:ru_s],
                )
                ids2, wid2, bad2 = r
                if ru_s < ru:
                    pad = ru - ru_s
                    uc2 = ids2.shape[1]
                    ids2 = jnp.concatenate(
                        [ids2, jnp.full((pad, uc2), -1, ids2.dtype)]
                    )
                    wid2 = jnp.concatenate(
                        [wid2, jnp.full((pad, uc2), -1, wid2.dtype)]
                    )
                    if getattr(bad2, "ndim", 0) == 2:
                        bad2 = jnp.concatenate(
                            [
                                bad2,
                                jnp.zeros((pad, bad2.shape[1]), bad2.dtype),
                            ]
                        )
                return ids2, wid2, bad2

            return run

        e_set = (
            (ru // 8, ru // 2) if cache_state is not None else (ru // 2,)
        )
        e_tiers = sorted({r for r in e_set if 2 <= r < ru})
        if e_tiers and ru > 4:
            expr = _enc_sliced(ru)
            for ru_s in reversed(e_tiers):
                inner = expr
                fit_s = total_u <= ru_s * uceff
                expr = (
                    lambda args, _f=fit_s, _r=_enc_sliced(ru_s),
                    _i=inner: jax.lax.cond(_f, _r, _i, args)
                )
            ids_u, wid_u2, bad_m = expr(None)
        else:
            ids_u, wid_u2, bad_m = encode_fn(
                b_u, uhead, inb_u, wid_u, wend_f, upos_f
            )
        if stop_at == "merge":
            return _stopf(jnp.sum(jnp.where(ids_u >= 0, ids_u, 0)))
        if stop_at is not None:
            return _stopf(
                _finish_expand(
                    ids_u, wid_u2, bad_m, ops, geom, b.shape, out_w,
                    cache_state, stop_at=stop_at, max_wlen=max_wlen,
                    patch_cap=patch_cap,
                )
            )
        return _finish_expand(
            ids_u, wid_u2, bad_m, ops, geom, b.shape, out_w, cache_state,
            max_wlen=max_wlen, patch_cap=patch_cap,
        )

    from .bpe_encode import take256

    ids0 = jnp.where(inb_u, take256(b_u, byte2id), -1)
    if whole_word:
        uh1 = word_hash_heads(b_u, uhead, inb_u, H1_MULT)
        uh2 = word_hash_heads(b_u, uhead, inb_u, H2_MULT)
        wwmask = ww_rows0.shape[0] - 1
        g0 = hash_jnp(uh1, uh2, ww_seed, wwmask, 0)
        g1 = hash_jnp(uh1, uh2, ww_seed, wwmask, 1)
        w0 = ww_rows0[g0]
        w1 = ww_rows1[g1]
        hit0 = (w0[..., 0] == uh1) & (w0[..., 1] == uh2)
        hit1 = (w1[..., 0] == uh1) & (w1[..., 1] == uh2)
        stored_len = jnp.where(hit0, w0[..., 2], w1[..., 2])
        stored_id = jnp.where(hit0, w0[..., 3], w1[..., 3])
        # word length at head = stored exclusive end - head position
        ulen_at = jnp.where(uhead, wend_f - upos_f, 0)
        ww_hit = (
            uhead & (hit0 | hit1) & (stored_len == ulen_at) & (ulen_at > 1)
        )
        f = jnp.where(uhead, ww_hit.astype(jnp.int32), -1)

        def op_fill(x, y):
            (v1,), (v2,) = x, y
            return (jnp.where(v2 >= 0, v2, v1),)

        (filled,) = jax.lax.associative_scan(op_fill, (f,), axis=1)
        word_is_hit = (filled == 1) & inb_u
        ids0 = jnp.where(uhead & ww_hit, stored_id, ids0)
        ids0 = jnp.where(word_is_hit & ~uhead, -1, ids0)

    # Occupancy tiers: every merge round costs the WHOLE buffer slice it
    # runs on, but unique words pack densely from row 0 (uoff is a global
    # cumsum), so the merge runs on the smallest static row slice the
    # unique bytes fit: ru/8 (the steady-state serving case — with the
    # persistent word cache, later chunks carry only NEW words, measured
    # a few % occupancy), ru/2 (typical cold chunks, ~25%), full (dedup-
    # poor chunks; ladder_depth=0 keeps the rare branch's compiled size
    # down).  Dead rows pad back after.
    def _merge_sliced(ru_s, depth):
        def run(args):
            i0, w0_ = args
            a, w, bad, _ = run_merge_phases(
                i0[:ru_s], w0_[:ru_s], rows0, rows1, seed, mclr,
                ladder_depth=depth,
            )
            if ru_s < ru:
                uc2 = a.shape[1]
                pad = ru - ru_s
                a = jnp.concatenate(
                    [a, jnp.full((pad, uc2), -1, a.dtype)]
                )
                w = jnp.concatenate(
                    [w, jnp.full((pad, uc2), -1, w.dtype)]
                )
                bad = jnp.concatenate([bad, jnp.zeros((pad,), bad.dtype)])
            return a, w, bad

        return run

    # smallest tier runs a plain while tail (depth 0): at its row count a
    # round is already cheap, and a third full ladder instance was +60%
    # lowered-program size (tests/test_program_size.py).  The ru/8 tier
    # exists only in the CACHED program — steady-state serving is where
    # occupancy drops to a few % — so the cold program stays two-tier.
    t_set = (ru // 8, ru // 2) if cache_state is not None else (ru // 2,)
    tiers = sorted({r for r in t_set if 2 <= r < ru})
    tier_depth = {ru // 2: ladder_depth}
    if tiers and ru > 4:
        expr = _merge_sliced(ru, 0)
        for ru_s in reversed(tiers):
            inner = expr
            fit_s = total_u <= ru_s * uceff
            expr = (
                lambda args, _f=fit_s,
                _r=_merge_sliced(ru_s, tier_depth.get(ru_s, 0)),
                _i=inner: jax.lax.cond(_f, _r, _i, args)
            )
        ids_u, wid_u2, bad_m = expr((ids0, wid_u))
    else:
        ids_u, wid_u2, bad_m, _ = run_merge_phases(
            ids0, wid_u, rows0, rows1, seed, mclr, ladder_depth=ladder_depth
        )
    # compaction overflow is per UNIQUE-BUFFER row ([ru] from `compact`);
    # broadcast it to position granularity so _finish_expand's word-level
    # machinery confines the damage to input rows whose words live in the
    # overflowing buffer rows (r2 collapsed this to any() — one dense-code
    # buffer row silently zeroed every row of the chunk)
    if getattr(bad_m, "ndim", 0) == 1 and bad_m.shape[0] == ids_u.shape[0]:
        bad_m = jnp.broadcast_to(bad_m[:, None], ids_u.shape)
    if stop_at == "merge":
        return _stopf(jnp.sum(jnp.where(ids_u >= 0, ids_u, 0)))
    if stop_at is not None:
        return _stopf(
            _finish_expand(
                ids_u, wid_u2, bad_m, ops, geom, b.shape, out_w,
                cache_state, stop_at=stop_at, max_wlen=max_wlen,
                patch_cap=patch_cap,
            )
        )
    return _finish_expand(
        ids_u, wid_u2, bad_m, ops, geom, b.shape, out_w, cache_state,
        max_wlen=max_wlen, patch_cap=patch_cap,
    )


def _finish_expand(ids_u, wid_u2, bad_m, ops, geom, b_shape, out_w,
                   cache_state, stop_at=None, max_wlen=None, patch_cap=0):
    """Expansion tail of `dedup_finish`: per-unique-word token counts,
    token storage (batch-local or persistent cache), and the routed
    per-input-row packed output — encoder-agnostic (shared by the BPE
    merge and the WordPiece longest-match encoders).

    `patch_cap` (static): when > 0, flagged words (encoder per-word bad
    flags, words over `max_wlen`, and dropped words) become PER-WORD PATCH
    RECORDS instead of poisoning their input rows: the extra outputs
    (patch_tab int32[patch_cap, 5] rows (row, col, wlen, tok_off,
    tok_cnt), n_patch scalar) let the host re-encode just those words and
    splice the ids at tok_off (replacing the device's tok_cnt tokens).
    Rows become row_bad from word flags only if n_patch > patch_cap
    (table overflow; host falls back to whole-row re-encode).  This is
    the r5 fix for the unigram engine's 40% row-fallback rate at bench
    shapes: a per-word tie/long-word rate of ~1e-4 multiplied across
    ~2.3k words/row made nearly half the rows host work.

    `stop_at` (static; profiling only — tools/profile_expand.py): return
    a checksum after the named sub-stage instead of the real outputs."""
    nw_cap, wc, uc, uceff, ru = geom
    wr = nw_cap // wc
    (
        rep,
        in_buf,
        uoff,
        total_u,
        wpos_w,
        wlen_w,
        wvalid,
        nw,
        hit,
        ct0,
        ccnt,
        cslot,
        wh1,
        wh2,
    ) = ops
    B, L = b_shape
    UF2 = ru * ids_u.shape[1]

    # ---- per-unique-word token counts and start offsets --------------
    # bad_m: scalar/[B]-shaped flags (whole-batch fallback, the merge
    # paths) or a [ru, uc2] per-position mask (per-WORD fallback: only
    # input rows whose words hit the flag re-encode on host — the unigram
    # near-tie contract, unigram_dedup.py)
    word_level_bad = getattr(bad_m, "ndim", 0) == 2
    alive = ids_u >= 0
    tpos = g_excl_cumsum(alive.astype(jnp.int32))
    seg = wid_u2 != jnp.concatenate(
        [jnp.full((ru, 1), -2, jnp.int32), wid_u2[:, :-1]], axis=1
    )
    k_in, _ = jax.lax.associative_scan(
        _seg_count_op, (alive.astype(jnp.int32), seg), axis=1
    )
    # dead slots from late merges keep their wid, so "last token of word"
    # must compare against the next *alive* position's wid (words never
    # cross buffer rows, so per-row fills suffice)
    (nxt_w,), nfnd = fill_next([wid_u2], alive, k_steps=9)
    is_last = alive & (~nfnd | (nxt_w != wid_u2))
    is_first = alive & seg

    # per-word token counts/starts: words are dense (rank = buffer order),
    # so a wrap butterfly compaction of the is_last/is_first values IS the
    # word-indexed array — no scatter (PERF.md: butterfly ~8x a scatter)
    from .route import compact_left as _cl

    def per_word(vals_mask, vals):
        (out,), _c = _cl((vals,), vals_mask, (0,), wrap=True)
        flat = out.reshape(-1)
        if flat.shape[0] < nw_cap:
            flat = jnp.concatenate(
                [flat, jnp.zeros((nw_cap - flat.shape[0],), flat.dtype)]
            )
        return flat[:nw_cap]

    if stop_at == "segs":
        return jnp.sum(tpos) + jnp.sum(is_last.astype(jnp.int32))
    tcnt_u = per_word(is_last, k_in)
    t0_u = per_word(is_first, tpos)
    if stop_at == "stats":
        return jnp.sum(tcnt_u) + jnp.sum(t0_u)
    if word_level_bad:
        # word-total of the flag (forward + reverse inclusive segment
        # sums cover flags after the word's last token), read at the
        # word's first token
        bi = bad_m.astype(jnp.int32)
        fwd, _ = jax.lax.associative_scan(
            _seg_count_op, (bi, seg), axis=1
        )
        seg_end = jnp.concatenate(
            [seg[:, 1:], jnp.ones((ru, 1), bool)], axis=1
        )
        bwd, _ = jax.lax.associative_scan(
            _seg_count_op, (bi, seg_end), axis=1, reverse=True
        )
        wbad_u = per_word(is_first, ((fwd + bwd - bi) > 0).astype(jnp.int32))
    else:
        wbad_u = jnp.zeros_like(tcnt_u)
    # ---- token storage: batch-local buffer, or the persistent cache --
    ok_ins = jnp.bool_(True) if word_level_bad else ~jnp.any(bad_m)
    # dense alive-token stream via butterfly left-pack (tpos IS its prefix
    # sum) — the flat scatters this replaces measured ~5x the route at
    # bench scale (PERF.md r4)
    (utoks2d,), new_tok = _cl((ids_u,), alive, (-1,), wrap=True)
    utoks = utoks2d.reshape(-1)[:UF2]
    if cache_state is None:
        tok_src = utoks
        tok_base = jnp.int32(0)
        src_cap = UF2
        new_state = None
    else:
        crows, cbuf, p = cache_state
        Sc = crows.shape[0]
        CAP = cbuf.shape[0] - 1
        # append this batch's merged tokens: the dense stream drops into
        # the cache buffer as one dynamic-slice window write (the epoch
        # reset in the caller guarantees p + UF2 <= CAP)
        if UF2 <= CAP + 1:
            start = jnp.clip(p, 0, CAP + 1 - UF2)
            win = jax.lax.dynamic_slice(cbuf, (start,), (UF2,))
            wi = jnp.arange(UF2, dtype=jnp.int32)
            keep = (wi < new_tok) & ok_ins
            cbuf = jax.lax.dynamic_update_slice(
                cbuf, jnp.where(keep, utoks, win), (start,)
            )
        else:  # cache smaller than one chunk's tokens: scatter (unused
            # by the shipped engines; WC_CAP >> any chunk)
            ttgt = jnp.where(
                alive & ok_ins, jnp.minimum(p + tpos, CAP), CAP
            ).reshape(-1)
            cbuf = cbuf.at[ttgt].set(ids_u.reshape(-1))
        tok_src = cbuf
        tok_base = p
        src_cap = CAP

    if stop_at == "stream":
        return jnp.sum(utoks) + new_tok
    # ---- expand to per-row packed output -----------------------------
    # width-4 rows (one zero pad): aligned row gathers cost ~3.2ns/row on
    # this backend while the old width-3 form lowered to the slow path
    pair = jnp.stack(
        [t0_u, tcnt_u, wbad_u, jnp.zeros_like(t0_u)], axis=-1
    )  # [nw_cap, 4]
    # wid_u2 counts heads in buffer order == the representative's unique
    # order among *merged* (uncached) representatives.
    uord = g_excl_cumsum(in_buf.astype(jnp.int32))
    # flat 512k-index gather -> width-8 row gather + lane select
    # (row gathers cost per ROW on this backend; PERF.md)
    from .merge_table import take_row8

    uord_of_rep = take_row8(
        jnp.clip(rep, 0, nw_cap - 1).reshape(-1), uord.reshape(-1)
    )
    pr = pair[jnp.clip(uord_of_rep, 0, nw_cap - 1)].reshape(wr, wc, 4)
    # hit words read from the cache rows; merged words from this batch's
    # freshly appended span (tok_base + local offset)
    t0_w = jnp.where(hit, ct0, tok_base + pr[..., 0])
    k_w = jnp.where(wvalid, jnp.where(hit, ccnt, pr[..., 1]), 0)
    # a merged word with ZERO tokens had every token dropped past a
    # compaction edge (its buffer row overflowed): its input rows must
    # host-fallback, and it must never enter the cache
    dropped = wvalid & ~hit & (pr[..., 1] == 0) & (wlen_w > 0)
    wbad_w = (wvalid & ~hit & (pr[..., 2] > 0)) | dropped
    if stop_at == "gather":
        return jnp.sum(t0_w) + jnp.sum(k_w)

    if cache_state is not None:
        # register merged representatives (overlong words excluded: their
        # rolling hash is truncated and unreliable; flagged words too)
        ins_ok = in_buf & ok_ins & (wlen_w <= WORD_CAP)
        prw0 = pair[jnp.clip(uord, 0, nw_cap - 1).reshape(-1)].reshape(
            wr, wc, 4
        )
        ins_ok = ins_ok & (prw0[..., 1] > 0)
        if word_level_bad:
            ins_ok = ins_ok & (prw0[..., 2] == 0)
        stgt = jnp.where(ins_ok, cslot, Sc).reshape(-1)
        rowvals = jnp.stack(
            [wh1, wh2, tok_base + prw0[..., 0], prw0[..., 1]], axis=-1
        ).reshape(-1, 4)
        crows = crows.at[stgt].set(rowvals, mode="drop")
        p2 = p + jnp.where(ok_ins, new_tok, 0)
        new_state = (crows, cbuf, p2)

    if max_wlen is not None:
        long_w = wvalid & (wlen_w > max_wlen)
        # long words never entered the unique buffer (dedup_layout): zero
        # device tokens, always flagged (patch records carry them to the
        # host).  Their rep/uord-derived stats are garbage — mask them.
        k_w = jnp.where(long_w, 0, k_w)
        wbad_w = wbad_w | long_w

    roww = jnp.where(wvalid, wpos_w // L, B)
    # previous word's output row, across the 2D word-table boundary
    prevw = jnp.concatenate(
        [
            jnp.concatenate(
                [jnp.full((1, 1), -1, jnp.int32), roww[:-1, -1:]], axis=0
            ),
            roww[:, :-1],
        ],
        axis=1,
    )
    rfirst = wvalid & (roww != prevw)
    G = g_excl_cumsum(k_w)
    import os as _os

    if _os.environ.get("TOKENIZERS_TPU_OLD_OFFS"):  # debug A/B only
        t0row = (
            jnp.zeros((B + 1,), jnp.int32)
            .at[jnp.where(rfirst.reshape(-1), roww.reshape(-1), B)]
            .set(G.reshape(-1))[: B + 1]
        )
        ooff = G - t0row[jnp.clip(roww, 0, B)]
        ntok = (
            jnp.zeros((B + 1,), jnp.int32)
            .at[jnp.where(wvalid.reshape(-1), roww.reshape(-1), B)]
            .max((ooff + k_w).reshape(-1))[:B]
        )
        tie_rows = (
            jnp.zeros((B + 1,), jnp.int32)
            .at[jnp.where(wbad_w.reshape(-1), roww.reshape(-1), B)]
            .max(1)[:B]
        )
    else:
        # ooff = G minus G-at-the-output-row's-first-word, via a row-major
        # segmented fill (roww is non-decreasing in word-table order) —
        # replaces the old [B+1] scatter + flat t0row[roww] gather (r4:
        # ~6 ms/chunk of the expansion stage at bench scale).  The
        # bad-flag cumsum rides the same fill.
        badcum = g_excl_cumsum(wbad_w.astype(jnp.int32))
        (g0, bc0), _ = _fill_last_wrap([G, badcum], rfirst)
        ooff = G - g0
        # per-output-row totals read at the row's LAST word (ooff + k_w is
        # the row-local inclusive token cumsum, so the last word carries
        # the row total); row badness rides bit 30 of the same value.
        # `roww` is SORTED in word-table order (invalid words sort last as
        # B), so each row's last word is a [B]-query binary search — r5:
        # this replaces a scatter-set over all 512k word slots (~2.8 ms at
        # bench scale) with ~19 gather steps over 256 queries.
        row_any_bad = (badcum + wbad_w.astype(jnp.int32) - bc0) > 0
        val = (ooff + k_w) | jnp.where(
            row_any_bad, jnp.int32(1) << 30, jnp.int32(0)
        )
        roww_f = roww.reshape(-1)
        idx = (
            jnp.searchsorted(
                roww_f, jnp.arange(B, dtype=jnp.int32), side="right"
            )
            - 1
        )
        hitr = (idx >= 0) & (
            roww_f[jnp.clip(idx, 0, roww_f.shape[0] - 1)]
            == jnp.arange(B, dtype=jnp.int32)
        )
        packed_row = jnp.where(
            hitr, val.reshape(-1)[jnp.clip(idx, 0, roww_f.shape[0] - 1)], 0
        )
        ntok = packed_row & ((jnp.int32(1) << 30) - 1)
        tie_rows = packed_row >> 30
    if stop_at == "offs":
        return jnp.sum(ooff) + jnp.sum(ntok)

    # word-head records spread to their output positions by a wrap
    # butterfly route (targets are monotone in word-table order); requires
    # B*out_w to be a multiple of the word-table column count, which holds
    # by construction (out_w = L//2 >= wc)
    olive = wvalid & (k_w > 0) & (ooff < out_w)
    otgt = jnp.where(olive, roww * out_w + ooff, 0)
    if (B * out_w) % wc == 0:
        from .route import route_to

        (od_r,), live_o = route_to(
            ((t0_w - ooff),), olive, otgt, (0,), wrap=True,
            n_out=B * out_w,
        )
        od0 = od_r.reshape(B, out_w)
        oset = live_o.reshape(B, out_w)
    else:  # fallback: flat scatter (odd geometries only)
        otgt_f = jnp.where(olive, otgt, B * out_w).reshape(-1)
        ohead_rec = jnp.stack(
            [(t0_w - ooff).reshape(-1), jnp.ones(nw_cap, jnp.int32)],
            axis=-1,
        )
        ohead = (
            jnp.full((B * out_w + 1, 2), -1, jnp.int32)
            .at[otgt_f]
            .set(ohead_rec)[: B * out_w]
        )
        od0 = ohead[:, 0].reshape(B, out_w)
        oset = (ohead[:, 1] == 1).reshape(B, out_w)
    if stop_at == "route":
        return jnp.sum(od0) + jnp.sum(oset.astype(jnp.int32))
    (od,), odset = _fill_last([od0], oset)
    if stop_at == "fill":
        return jnp.sum(od) + jnp.sum(odset.astype(jnp.int32))
    opos = jax.lax.broadcasted_iota(jnp.int32, (B, out_w), 1)
    osrc = jnp.clip(od + opos, 0, src_cap - 1)
    in_out = odset & (opos < ntok[:, None])
    # token fetch as a width-4 ROW gather + 2-bit select: row gathers cost
    # per row (~3.2ns) regardless of width, flat gathers ~8ns/index
    nr4 = tok_src.shape[0] // 4
    rows4 = tok_src[: nr4 * 4].reshape(nr4, 4)
    r4 = rows4[jnp.clip(osrc >> 2, 0, nr4 - 1)]
    sel = osrc & 3
    fetched = jnp.where(
        sel == 0,
        r4[..., 0],
        jnp.where(
            sel == 1, r4[..., 1], jnp.where(sel == 2, r4[..., 2], r4[..., 3])
        ),
    )
    ids_out = jnp.where(in_out, fetched, -1)

    # token-count overflow is PER ROW: a word with ooff + k_w > out_w
    # makes its row's ntok exceed out_w (ntok is the scatter-max of
    # exactly that), its records never leave the row's output segment
    # (otgt = roww * out_w + ooff with ooff < out_w), and every other
    # row's routing is untouched.  Only merge-buffer badness (unique
    # buffer shared by all rows) is batch-wide.  r2 broadcast overflow to
    # the whole batch, which silently zeroed ALL 256 rows of a chunk when
    # one dense-code row needed > out_w tokens.
    row_over = ntok > out_w
    any_bad = (
        jnp.bool_(False) if word_level_bad else jnp.any(bad_m)
    )
    ntok = jnp.where(row_over, 0, ntok)
    row_bad = row_over | jnp.broadcast_to(any_bad, (B,))
    if patch_cap:
        # flagged words -> per-word patch records (host re-encodes each
        # word and splices at tok_off); their rows stay on device.  Only
        # a table overflow falls back to whole-row badness.
        rank = g_excl_cumsum(wbad_w.astype(jnp.int32))
        nflag = (
            rank.reshape(-1)[-1]
            + wbad_w.reshape(-1)[-1].astype(jnp.int32)
        )
        col_w = wpos_w - jnp.where(wvalid, wpos_w // L, 0) * L
        tgt = jnp.where(
            wbad_w, jnp.minimum(rank, patch_cap), patch_cap
        ).reshape(-1)
        recs = jnp.stack(
            [roww, col_w, wlen_w, ooff, k_w], axis=-1
        ).reshape(-1, 5)
        patch_tab = (
            jnp.zeros((patch_cap + 1, 5), jnp.int32)
            .at[tgt]
            .set(recs, mode="drop")[:patch_cap]
        )
        row_bad = row_bad | ((tie_rows > 0) & (nflag > patch_cap))
    else:
        # flagged or dropped words -> their input rows re-encode on host
        # (tie_rows: bit 30 of the packed per-row scatter above)
        row_bad = row_bad | (tie_rows > 0)
    if _os.environ.get("TOKENIZERS_TPU_DEBUG_EXPAND"):  # debug only
        jax.debug.print(
            "expand: nw={nw} over={o} tie={t} anyb={a} drop={d} wbad={w} "
            "hit={h} ties_u={tu}",
            nw=nw,
            o=jnp.sum(row_over.astype(jnp.int32)),
            t=jnp.sum((tie_rows > 0).astype(jnp.int32)),
            a=any_bad.astype(jnp.int32),
            d=jnp.sum(dropped.astype(jnp.int32)),
            w=jnp.sum(wbad_w.astype(jnp.int32)),
            h=jnp.sum(hit.astype(jnp.int32)),
            tu=jnp.sum(wbad_u.astype(jnp.int32)),
        )
    result = (ids_out, ntok, row_bad)
    if patch_cap:
        result = result + (patch_tab, nflag)
    if cache_state is None:
        return result
    return result, new_state
