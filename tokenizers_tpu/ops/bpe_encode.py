"""TPU byte-level BPE encode: the batched device program.

This replaces the reference's per-string hot path — Oniguruma regex pre-split
(`pre_tokenizers/byte_level.rs:119-148`) + per-word heap merge loop
(`models/bpe/word.rs:162-250`) — with one jitted tensor program over a packed
`uint8[B, L]` byte batch:

1.  **UTF-8 decode** (vectorized): char-start mask, codepoints, char classes
    via the two-stage Unicode table (`unicode_tables.py`).
2.  **Pre-split**: the GPT-2 pattern
    `'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+`
    is *not* run as a regex.  Its match-start positions are provably a local
    function of (prev char class, char class, next char class) plus a
    bounded-lookahead contraction rule — validated exhaustively against the
    host regex backend in tests.  One vectorized pass, no DFA, no backtracking.
3.  **Merge loop**: tokens live in a tombstoned linked list over the byte
    axis.  Each round: rank lookup for every adjacent pair (2-probe cuckoo
    hash), segmented min per word, and a parity scan that merges *every*
    occurrence of each word's current minimum-rank pair at once (leftmost-
    first within runs of overlapping equal pairs).  This is bit-equivalent to
    the reference's sequential (rank, pos) heap order for any well-formed
    merge table (every merge producing token t has lower rank than merges
    consuming t — true of all trained BPE tables; `models/bpe/model.rs`
    builds ranks in exactly that order), because merging a word's minimum
    rank first is exactly what the heap does, and new pairs created by a
    merge always rank strictly above it.

All shapes are static; the whole program is one `jit` per (B, L) bucket.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .merge_table import CuckooMergeTable, hash_jnp
from .unicode_tables import (
    CLS_END,
    CLS_L,
    CLS_N,
    CLS_O,
    CLS_SP,
    CLS_WS,
    PAGE_BITS,
    char_class_tables,
)

INF = np.int32(0x7FFFFFFF)


def _shift_prev(x, fill, k=1):
    """x[:, j-k] (row-wise), first k cols <- fill."""
    return jnp.concatenate(
        [jnp.full((x.shape[0], k), fill, x.dtype), x[:, :-k]], axis=1
    )


def take256(idx, table):
    """`table[idx]` for an int32 table of exactly 256 entries, as one-hot
    bf16 matmuls on the MXU — measured ~7x a native gather per index on
    this backend.  Each byte plane of the value is an exact bf16 integer
    (<= 255), so the composed int32 result is exact for values < 2^24."""
    oh = jax.nn.one_hot(idx, 256, dtype=jnp.bfloat16)
    planes = []
    for shift in (0, 8, 16):
        t = ((table >> shift) & 0xFF).astype(jnp.bfloat16)
        planes.append((oh @ t[:, None])[..., 0].astype(jnp.int32) << shift)
    return planes[0] | planes[1] | planes[2]


def _shift_next(x, fill, k=1):
    """x[:, j+k] (row-wise), last k cols <- fill."""
    return jnp.concatenate(
        [x[:, k:], jnp.full((x.shape[0], k), fill, x.dtype)], axis=1
    )


# --------------------------------------------------------------------------
# Stage 1+2: UTF-8 decode + GPT-2 pre-split boundaries
# --------------------------------------------------------------------------


def ascii_cls(b):
    """Char class for byte values < 128, fully elementwise (no gather).

    Equal to `char_class_flat()[:128]` by construction: \\p{L} in ASCII is
    [A-Za-z], \\p{N} is [0-9], Oniguruma \\s is [\\t\\n\\x0b\\f\\r ]
    (`unicode_tables._WS_CODEPOINTS`); verified in tests."""
    bl = b | 32
    is_l = (bl >= 97) & (bl <= 122)
    is_n = (b >= 48) & (b <= 57)
    is_ws = (b >= 9) & (b <= 13)
    return jnp.where(
        is_l,
        CLS_L,
        jnp.where(
            is_n,
            CLS_N,
            jnp.where(b == 32, CLS_SP, jnp.where(is_ws, CLS_WS, CLS_O)),
        ),
    ).astype(jnp.int32)


def gpt2_boundaries(b, inb, cls_table, ascii_only=False):
    """Match-start mask of the GPT-2 split pattern over packed bytes.

    b: int32[B, L] byte values (0 outside text); inb: bool[B, L] in-text mask.
    cls_table: flat int8[0x110000] codepoint->class table.
    `ascii_only` (static): all bytes < 128 — skips the UTF-8 decode and the
    per-position class-table gather (the gather costs ~100x an elementwise
    op on this backend; natural-language chunks are usually pure ASCII).
    Returns (bnd bool[B,L], is_start bool[B,L]).
    """
    B, L = b.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    length = jnp.sum(inb.astype(jnp.int32), axis=1, keepdims=True)

    b1 = _shift_next(b, 0)
    b2 = _shift_next(b, 0, 2)

    if ascii_only:
        is_start = inb
        cls = cls_fill = ascii_cls(b)
        prev_cls = _shift_prev(cls_fill, CLS_END)
        prev_cls = jnp.where(pos == 0, CLS_END, prev_cls)
        next_exists = (pos + 1) < length
        next_cls = jnp.where(
            next_exists, _shift_next(cls_fill, -1), CLS_END
        )
    else:
        is_cont = (b & 0xC0) == 0x80
        is_start = inb & ~is_cont
        charlen = (
            1
            + (b >= 0xC0).astype(jnp.int32)
            + (b >= 0xE0).astype(jnp.int32)
            + (b >= 0xF0).astype(jnp.int32)
        )

        b3 = _shift_next(b, 0, 3)
        cp1 = b
        cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
        cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        cp4 = ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
        cp = jnp.where(
            charlen == 1, cp1, jnp.where(charlen == 2, cp2, jnp.where(charlen == 3, cp3, cp4))
        )
        cp = jnp.clip(cp, 0, 0x10FFFF)

        from .merge_table import take_row8

        cls = take_row8(cp, cls_table).astype(jnp.int32)

        # forward-fill class over continuation bytes (<= 3 steps)
        f = jnp.where(is_start, cls, -1)
        for _ in range(3):
            f = jnp.where(f >= 0, f, _shift_prev(f, -1))
        cls_fill = f

        prev_cls = _shift_prev(cls_fill, CLS_END)
        prev_cls = jnp.where(pos == 0, CLS_END, prev_cls)

        # class of the next char: at distance charlen in {1..4} — four
        # shifted selects instead of a per-index gather (gathers are ~100x
        # an elementwise op on this backend)
        next_exists = (pos + charlen) < length
        next_cls_raw = _shift_next(cls_fill, -1)
        for k in (2, 3, 4):
            next_cls_raw = jnp.where(
                charlen == k, _shift_next(cls_fill, -1, k), next_cls_raw
            )
        next_cls = jnp.where(next_exists, next_cls_raw, CLS_END)

    # contraction: 's|'t|'re|'ve|'m|'ll|'d at a match-start apostrophe
    apo = is_start & (b == 0x27)
    p_ok = (pos == 0) | (prev_cls == CLS_L) | (prev_cls == CLS_N) | (prev_cls == CLS_WS)
    is3 = (
        ((b1 == ord("r")) & (b2 == ord("e")))
        | ((b1 == ord("v")) & (b2 == ord("e")))
        | ((b1 == ord("l")) & (b2 == ord("l")))
    ) & ((pos + 2) < length)
    is2 = (
        (b1 == ord("s")) | (b1 == ord("t")) | (b1 == ord("m")) | (b1 == ord("d"))
    ) & ((pos + 1) < length)
    contr = apo & p_ok & (is3 | is2)
    contr3 = contr & is3
    contr2 = contr & ~is3

    def shl(x, k):  # mark position j+k where x at j
        return jnp.concatenate(
            [jnp.zeros((B, k), dtype=bool), x[:, : L - k]], axis=1
        )

    interior = shl(contr, 1) | shl(contr3, 2)
    contr_end = shl(contr2, 2) | shl(contr3, 3)

    is_ws = (cls == CLS_SP) | (cls == CLS_WS)
    p_is_ws = (prev_cls == CLS_SP) | (prev_cls == CLS_WS)
    n_nonws = next_exists & (next_cls != CLS_SP) & (next_cls != CLS_WS)

    # non-whitespace char: new match unless it extends the previous run or
    # attaches to a preceding literal space
    b_nonws = jnp.where(
        prev_cls == CLS_SP,
        False,
        jnp.where(
            prev_cls == CLS_WS,
            True,
            jnp.where(
                prev_cls == CLS_L,
                cls != CLS_L,
                jnp.where(
                    prev_cls == CLS_N,
                    cls != CLS_N,
                    (cls == CLS_L) | (cls == CLS_N),  # prev O
                ),
            ),
        ),
    )
    # whitespace char: run-internal split before the final pre-word space
    b_ws = jnp.where(p_is_ws, n_nonws, True)

    bnd = jnp.where(is_ws, b_ws, b_nonws)
    bnd = bnd | (pos == 0) | contr_end
    bnd = bnd & ~interior & is_start & inb
    return bnd, is_start


# --------------------------------------------------------------------------
# Stage 3: the merge loop
# --------------------------------------------------------------------------
# The hot loop lives in bpe_merge2.py (gather-minimal formulation).  The
# segmented-min and chain-parity helpers below are shared with the
# distributed trainer (`bpe_train_step.py`), which still uses the
# linked-list formulation (one selected pair per round).


def _seg_min(r, seg_start):
    """Min of r within contiguous segments delimited by seg_start flags."""

    def op(a, b):
        (v1, f1), (v2, f2) = a, b
        return jnp.where(f2, v2, jnp.minimum(v1, v2)), f1 | f2

    fwd, _ = jax.lax.associative_scan(op, (r, seg_start), axis=1)
    seg_end = _shift_next(seg_start, True)
    bwd, _ = jax.lax.associative_scan(op, (r, seg_end), axis=1, reverse=True)
    return jnp.minimum(fwd, bwd)


# parity-state transition vectors: state in {0: none, 1: even, 2: odd}
_T_ID = np.array([0, 1, 2], dtype=np.int32)
_T_RESET = np.array([0, 0, 0], dtype=np.int32)
_T_INC = np.array([1, 2, 1], dtype=np.int32)


def _chain_parity(f, transparent):
    """For runs of consecutive `f` positions (skipping `transparent` ones),
    the within-run parity: 1 at even offsets (merge), 2 at odd.

    Non-transparent non-f positions reset the run."""
    trans = jnp.where(
        transparent[..., None],
        jnp.asarray(_T_ID),
        jnp.where(f[..., None], jnp.asarray(_T_INC), jnp.asarray(_T_RESET)),
    )

    def compose(u, v):  # apply u then v
        return jnp.take_along_axis(v, u, axis=-1)

    scanned = jax.lax.associative_scan(compose, trans, axis=1)
    return scanned[..., 0]


# --------------------------------------------------------------------------
# Full program
# --------------------------------------------------------------------------


def _encode_core(
    bytes_u8,
    lengths,
    byte2id,
    cls_table,
    merge_rows0,
    merge_rows1,
    seed,
    merge_mclr=None,
    with_word_ids=False,
    boundary="gpt2",
    whole_word=False,
    ww_rows0=None,
    ww_rows1=None,
    ww_seed=0,
    with_offsets=False,
    dedup=True,
    word_cache=False,
    cache_rows=None,
    cache_buf=None,
    cache_p=None,
    ascii_only=False,
    profile_stop=None,
):
    """uint8[B,L] bytes + int32[B] lengths
    -> (ids int32[B, L//2], ntok int32[B], row_bad bool[B]).

    Token ids are left-packed per row; positions >= ntok[i] are -1.  Rows
    with row_bad set (word longer than WORD_CAP bytes, or token count
    exceeding L//2 — unmergeable input) must be re-encoded on the host.

    merge_rows*/ww_rows*: cuckoo tables as [S, 4] rows (key_a, key_b,
    value0, value1); see bpe_merge2.py / merge_table.py.

    `boundary` selects the pre-split rule set ("gpt2" or "llama3").
    `whole_word` enables the BPE `ignore_merges` bypass (reference
    `models/bpe/model.rs:475-497`): words whose double rolling hash hits the
    vocab word table emit their vocab id directly and skip the merge loop.
    """
    from .bpe_merge2 import WORD_CAP, compact, run_merge_phases

    B, L = bytes_u8.shape
    b = bytes_u8.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    inb = pos < lengths[:, None]
    b = jnp.where(inb, b, 0)

    BIGP = jnp.int32(0x7FFFFFFF)
    hashes = None
    if boundary == "gpt2":
        from . import layout_pallas
        from .merge_pallas import use_pallas

        if (
            ascii_only
            and dedup
            and not whole_word
            and use_pallas()
            and layout_pallas.supported(b.shape)
        ):
            # fused VMEM pass: boundaries + next-boundary + word hashes
            bnd, nxt_bnd, h1k, h2k = layout_pallas.layout_fused(b, lengths)
            hashes = (h1k, h2k)
        else:
            bnd, _ = gpt2_boundaries(
                b, inb, cls_table, ascii_only=ascii_only
            )
            nxt_bnd = None
    else:
        from .llama3_presplit import llama3_boundaries

        bnd, _ = llama3_boundaries(b, inb, cls_table, ascii_only=ascii_only)
        nxt_bnd = None

    word_id = jnp.where(inb, jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1, -1)

    # word-length guard (fill depth in the merge loop is bounded by WORD_CAP)
    if nxt_bnd is None:
        nbp = jax.lax.cummin(
            jnp.where(bnd, pos, BIGP), axis=1, reverse=True
        )
        nxt_bnd = _shift_next(nbp, BIGP)
    wlen = jnp.minimum(nxt_bnd, lengths[:, None]) - pos  # at word heads
    row_bad = jnp.any(bnd & (wlen > WORD_CAP), axis=1)

    def _stop(val):
        """Profiling early-exit (tools/profile_scan.py): the checksum rides
        out in ntok so every stop variant keeps the REAL output signature
        (and the scan/cond structure above it compiles unchanged)."""
        r = (
            jnp.zeros((B, max(L // 2, 64)), jnp.int32),
            jnp.full((B,), val.astype(jnp.int32), jnp.int32),
            jnp.zeros((B,), bool),
        )
        if word_cache:
            return r[0], r[1], r[2], (cache_rows, cache_buf, cache_p)
        return r

    if profile_stop == "bnd":
        return _stop(jnp.sum(bnd.astype(jnp.int32)) + jnp.sum(nxt_bnd & 1))

    def make_ids0():
        ids0 = jnp.where(inb, take256(b, byte2id), -1)

        if whole_word:
            # double rolling hash per word (segmented affine scans)
            def word_hash(mult):
                def op(x, y):
                    (a1, c1, f1), (a2, c2, f2) = x, y
                    a = jnp.where(f2, a2, a1 * a2)
                    c = jnp.where(f2, c2, c1 * a2 + c2)
                    return a, c, f1 | f2

                a0 = jnp.full((B, L), np.uint32(mult))
                c0 = (b + 1).astype(jnp.uint32)
                _, h, _ = jax.lax.associative_scan(op, (a0, c0, bnd), axis=1)
                return h

            h1 = word_hash(0x01000193)
            h2 = word_hash(0x0000C597)
            end_pos = jnp.minimum(nxt_bnd, lengths[:, None]) - 1
            end_cl = jnp.clip(end_pos, 0, L - 1)
            wh1 = jnp.take_along_axis(h1, end_cl, axis=1).astype(jnp.int32)
            wh2 = jnp.take_along_axis(h2, end_cl, axis=1).astype(jnp.int32)
            wlen_b = end_pos - pos + 1
            wwmask = ww_rows0.shape[0] - 1
            g0 = hash_jnp(wh1, wh2, ww_seed, wwmask, 0)
            g1 = hash_jnp(wh1, wh2, ww_seed, wwmask, 1)
            w0 = ww_rows0[g0]
            w1 = ww_rows1[g1]
            hit0 = (w0[..., 0] == wh1) & (w0[..., 1] == wh2)
            hit1 = (w1[..., 0] == wh1) & (w1[..., 1] == wh2)
            stored_len = jnp.where(hit0, w0[..., 2], w1[..., 2])
            stored_id = jnp.where(hit0, w0[..., 3], w1[..., 3])
            ww_hit = bnd & (hit0 | hit1) & (stored_len == wlen_b) & (wlen_b > 1)
            # word head takes the vocab id; the rest of the word dies.
            f = jnp.where(bnd, ww_hit.astype(jnp.int32), -1)

            def op_fill(x, y):
                (v1,), (v2,) = x, y
                return (jnp.where(v2 >= 0, v2, v1),)

            (filled,) = jax.lax.associative_scan(op_fill, (f,), axis=1)
            word_is_hit = (filled == 1) & inb
            ids0 = jnp.where(bnd & ww_hit, stored_id, ids0)
            ids0 = jnp.where(word_is_hit & ~bnd, -1, ids0)
        return ids0

    if dedup and not with_word_ids and not with_offsets:
        # word-dedup fast branch: encode each distinct word once
        # (bpe_dedup.py); falls back to the full-width merge when the
        # unique buffer or word table would overflow (CJK, random bytes).
        from .bpe_dedup import (
            buffer_geometry,
            dedup_finish,
            dedup_layout,
        )

        geom = buffer_geometry(B * L)
        out_w = max(L // 2, 64)
        if word_cache:
            # persistent cross-batch word cache (engine-held device state);
            # when the token buffer could overflow this batch, reset the
            # epoch in-graph: void all hits, zero the table, rewind p.
            CAP = cache_buf.shape[0] - 1
            reset = cache_p + jnp.int32((B * L) // 2) > CAP
            crows_eff = jnp.where(reset, 0, cache_rows)
            p_eff = jnp.where(reset, jnp.int32(0), cache_p)
            cache = (crows_eff, reset)
            cstate = (crows_eff, cache_buf, p_eff)
        else:
            cache = None
            cstate = None
        fits, dops = dedup_layout(
            b, bnd, inb, lengths, nxt_bnd, seed, geom, cache=cache,
            hashes=hashes,
        )
        if profile_stop == "dlayout":
            return _stop(dops[3] + dops[7] + jnp.sum(dops[2] & 1))

        def make_branch_fast(g, ladder_depth=2):
            def branch_fast(dops):
                r = dedup_finish(
                    dops,
                    b,
                    byte2id,
                    merge_rows0,
                    merge_rows1,
                    seed,
                    merge_mclr,
                    out_w,
                    g,
                    whole_word=whole_word,
                    ww_rows0=ww_rows0,
                    ww_rows1=ww_rows1,
                    ww_seed=ww_seed,
                    cache_state=cstate,
                    ladder_depth=ladder_depth,
                    stop_at=profile_stop,
                )
                return r if word_cache else (r, ())

            return branch_fast

        branch_fast = make_branch_fast(geom)

        def branch_full(dops):
            # rare fallback: ladder_depth=0 keeps the compiled program
            # small (the r4 2-rung ladder doubled the serialized scan
            # program to 125MB with the ladder in every branch)
            ids, _w, bad2, _o = run_merge_phases(
                make_ids0(), word_id, merge_rows0, merge_rows1, seed,
                merge_mclr, ladder_depth=0,
            )
            alive = ids >= 0
            k = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
            ntok = jnp.where(alive, k + 1, 0).max(axis=1)
            rows = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
            scatter_idx = jnp.where(alive & (k < out_w), k, out_w)
            packed = (
                jnp.full((B, out_w + 1), -1, jnp.int32)
                .at[rows, scatter_idx]
                .set(jnp.where(alive & (k < out_w), ids, -1))[:, :out_w]
            )
            # the merge width (5W/8 since r3) exceeds out_w: rows whose
            # token count lands in (out_w, 5W/8] are no longer caught by
            # compaction overflow — flag them here
            bad2 = bad2 | (ntok > out_w)
            ntok = jnp.where(ntok > out_w, 0, ntok)
            return (packed, ntok, bad2), (cstate if word_cache else ())

        import os as _os

        # big-bucket threshold overridable so the fallback-ceiling tests
        # can exercise the bench branch structure (dedup-or-host, no
        # full-width merge) at CPU-compilable shapes
        big_min = int(
            _os.environ.get("TOKENIZERS_TPU_BIG_BUCKET_MIN", 1 << 20)
        )
        if B * L >= big_min:
            # big (TPU-sized) buckets: chunks whose unique words overflow
            # the bl/8 dedup buffer (>12.5% unique bytes — the bench
            # corpus worst case is 8.4%) fall back to the host whole-chunk
            # (row_bad), the contract row_bad always had.  r4 kept a
            # second bl/2-capacity merge cascade for the 12.5-50% range;
            # r5 drops it: that one branch was ~25% of the compiled
            # executable (its [293,*] merge buffer dominated the fusion
            # census), and executable bytes are warm-start seconds on
            # this backend (~2s/MB through the relay).

            def branch_host(dops):
                r = (
                    jnp.full((B, out_w), -1, jnp.int32),
                    jnp.zeros((B,), jnp.int32),
                    jnp.ones((B,), bool),
                )
                return r, (cstate if word_cache else ())

            (ids_pk, ntok, badm), st = jax.lax.cond(
                fits, branch_fast, branch_host, dops
            )
        else:
            (ids_pk, ntok, badm), st = jax.lax.cond(
                fits, branch_fast, branch_full, dops
            )
        if word_cache:
            return ids_pk, ntok, row_bad | badm, st
        return ids_pk, ntok, row_bad | badm

    ids0 = make_ids0()
    obp0 = pos if (with_offsets or with_word_ids) else None
    ids, wid2, bad2, obp2 = run_merge_phases(
        ids0, word_id, merge_rows0, merge_rows1, seed, merge_mclr, obp=obp0
    )
    row_bad = row_bad | bad2

    out_w = ids.shape[1]
    alive = ids >= 0
    k = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
    ntok = jnp.where(alive, k + 1, 0).max(axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
    scatter_idx = jnp.where(alive, k, out_w)

    def pack(x, fill=-1):
        return (
            jnp.full((B, out_w + 1), fill, jnp.int32)
            .at[rows, scatter_idx]
            .set(x)[:, :out_w]
        )

    result = (pack(ids), ntok, row_bad)
    if with_word_ids:
        result = result + (pack(wid2),)
    if with_offsets:
        starts = pack(jnp.where(alive, obp2, 0))
        wids_out = pack(wid2)
        # token end byte (exclusive, in prepared space): next token's start
        # when it belongs to the same word, else the word's end boundary
        nstarts = _shift_next(starts, 0)
        nwids = _shift_next(wids_out, -2)
        # word end per byte position (computed pre-merge): last byte + 1
        wend_b = jnp.minimum(nxt_bnd, lengths[:, None])  # exclusive end
        tok_pos = jax.lax.broadcasted_iota(jnp.int32, starts.shape, 1)
        in_tok = tok_pos < ntok[:, None]
        wend_at = jnp.take_along_axis(
            wend_b, jnp.clip(starts, 0, L - 1), axis=1
        )
        ends = jnp.where(
            in_tok & (nwids == wids_out) & (_shift_next(in_tok, False)),
            nstarts,
            wend_at,
        )
        ends = jnp.where(in_tok, ends, 0)
        result = result + (starts, ends, wids_out)
    return result


encode_program = functools.partial(
    jax.jit,
    static_argnames=(
        "with_word_ids",
        "boundary",
        "whole_word",
        "with_offsets",
        "dedup",
        "word_cache",
        "ascii_only",
        "profile_stop",
    ),
    donate_argnames=("cache_rows", "cache_buf", "cache_p"),
)(_encode_core)


@functools.partial(
    jax.jit,
    static_argnames=(
        "boundary", "whole_word", "ascii_only", "word_cache", "profile_stop",
    ),
    donate_argnames=("cache_rows", "cache_buf", "cache_p"),
)
def encode_program_scan(
    bytes_u8,  # uint8[N, B, L]
    lengths,  # int32[N, B]
    byte2id,
    cls_table,
    merge_rows0,
    merge_rows1,
    seed,
    merge_mclr=None,
    boundary="gpt2",
    whole_word=False,
    ww_rows0=None,
    ww_rows1=None,
    ww_seed=0,
    cache_rows=None,
    cache_buf=None,
    cache_p=None,
    ascii_only=False,
    word_cache=True,
    profile_stop=None,
):
    """N same-shape chunks in ONE device dispatch via `lax.scan`, threading
    the persistent word cache through as the scan carry.

    Per-chunk dispatch overhead over the transport is ~10ms on this backend;
    a 32MB batch in 2MB chunks pays it 16x.  Scanning compiles the chunk
    program once and runs all chunks in a single call — and because the
    cache is the carry, each distinct word across the *whole batch* runs
    the merge loop exactly once (chunk k reads hits written by chunks < k).

    Returns (ids int32[N, B, L//2], ntok int32[N, B], row_bad bool[N, B],
    (cache_rows', cache_buf', cache_p')).  With `word_cache=False` the
    cache args are ignored and the carry returned is ().

    `word_cache=False` still dedups within each chunk; it only skips the
    cross-chunk persistent cache (used for cold-throughput benchmarking)."""

    def step(carry, xs):
        buf, lens = xs
        if word_cache:
            crows, cbuf, p = carry
            ids, ntok, bad, st = _encode_core(
                buf,
                lens,
                byte2id,
                cls_table,
                merge_rows0,
                merge_rows1,
                seed,
                merge_mclr=merge_mclr,
                boundary=boundary,
                whole_word=whole_word,
                ww_rows0=ww_rows0,
                ww_rows1=ww_rows1,
                ww_seed=ww_seed,
                word_cache=True,
                cache_rows=crows,
                cache_buf=cbuf,
                cache_p=p,
                ascii_only=ascii_only,
                profile_stop=profile_stop,
            )
            return tuple(st), (ids, ntok, bad)
        ids, ntok, bad = _encode_core(
            buf,
            lens,
            byte2id,
            cls_table,
            merge_rows0,
            merge_rows1,
            seed,
            merge_mclr=merge_mclr,
            boundary=boundary,
            whole_word=whole_word,
            ww_rows0=ww_rows0,
            ww_rows1=ww_rows1,
            ww_seed=ww_seed,
            ascii_only=ascii_only,
            profile_stop=profile_stop,
        )
        return carry, (ids, ntok, bad)

    init = (cache_rows, cache_buf, cache_p) if word_cache else ()
    carry, (ids, ntok, bad) = jax.lax.scan(step, init, (bytes_u8, lengths))
    return ids, ntok, bad, carry
