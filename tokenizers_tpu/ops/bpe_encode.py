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


def _shift_prev(x, fill):
    """x[:, j-1] (row-wise), col 0 <- fill."""
    return jnp.concatenate(
        [jnp.full((x.shape[0], 1), fill, x.dtype), x[:, :-1]], axis=1
    )


def _shift_next(x, fill, k=1):
    """x[:, j+k] (row-wise), last k cols <- fill."""
    return jnp.concatenate(
        [x[:, k:], jnp.full((x.shape[0], k), fill, x.dtype)], axis=1
    )


# --------------------------------------------------------------------------
# Stage 1+2: UTF-8 decode + GPT-2 pre-split boundaries
# --------------------------------------------------------------------------


def gpt2_boundaries(b, inb, stage1, stage2):
    """Match-start mask of the GPT-2 split pattern over packed bytes.

    b: int32[B, L] byte values (0 outside text); inb: bool[B, L] in-text mask.
    Returns (bnd bool[B,L], is_start bool[B,L]).
    """
    B, L = b.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    length = jnp.sum(inb.astype(jnp.int32), axis=1, keepdims=True)

    is_cont = (b & 0xC0) == 0x80
    is_start = inb & ~is_cont
    charlen = (
        1
        + (b >= 0xC0).astype(jnp.int32)
        + (b >= 0xE0).astype(jnp.int32)
        + (b >= 0xF0).astype(jnp.int32)
    )

    b1 = _shift_next(b, 0)
    b2 = _shift_next(b, 0, 2)
    b3 = _shift_next(b, 0, 3)
    cp1 = b
    cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
    cp = jnp.where(
        charlen == 1, cp1, jnp.where(charlen == 2, cp2, jnp.where(charlen == 3, cp3, cp4))
    )
    cp = jnp.clip(cp, 0, 0x10FFFF)

    page = stage1[cp >> PAGE_BITS]
    cls = stage2[(page << PAGE_BITS) | (cp & ((1 << PAGE_BITS) - 1))].astype(jnp.int32)

    # forward-fill class over continuation bytes (<= 3 steps)
    f = jnp.where(is_start, cls, -1)
    for _ in range(3):
        f = jnp.where(f >= 0, f, _shift_prev(f, -1))
    cls_fill = f

    prev_cls = _shift_prev(cls_fill, CLS_END)
    prev_cls = jnp.where(pos == 0, CLS_END, prev_cls)

    next_idx = jnp.clip(pos + charlen, 0, L - 1)
    next_exists = (pos + charlen) < length
    next_cls_raw = jnp.take_along_axis(cls_fill, next_idx, axis=1)
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


def _merge_loop_impl(ids0, nxt0, prv0, alive0, seg_start, lookup):
    """Run merge rounds until no word has a mergeable pair.

    Arrays are [B, L+1]; column L is a sentinel (dead, id -1, self-linked).
    `lookup(ids, next_ids, valid) -> (rank, new_id)` with rank INF on miss.
    """
    B, LP = ids0.shape
    L = LP - 1

    def take(x, idx):
        return jnp.take_along_axis(x, idx, axis=1)

    def cond(state):
        _, _, _, _, any_merge = state
        return any_merge

    def body(state):
        ids, nxt, prv, alive, _ = state
        nid = take(ids, nxt)
        valid = alive & (nxt < L)
        r, new_id = lookup(ids, nid, valid)
        wmin = _seg_min(r, seg_start)
        f = valid & (r < INF) & (r == wmin)
        parity = _chain_parity(f, ~alive)
        merge = f & (parity == 1)

        ids = jnp.where(merge, new_id, ids)
        kill = take(merge, prv)
        alive = alive & ~kill
        nxt = jnp.where(merge, take(nxt, nxt), nxt)
        kp = take(kill, prv)
        prv = jnp.where(kp, take(prv, prv), prv)
        return ids, nxt, prv, alive, jnp.any(merge)

    init = (ids0, nxt0, prv0, alive0, jnp.array(True))
    ids, nxt, prv, alive, _ = jax.lax.while_loop(cond, body, init)
    return ids, alive


# --------------------------------------------------------------------------
# Full program
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("with_word_ids", "boundary", "whole_word")
)
def encode_program(
    bytes_u8,
    lengths,
    byte2id,
    stage1,
    stage2,
    key_a,
    key_b,
    rank,
    new_id,
    seed,
    with_word_ids=False,
    boundary="gpt2",
    whole_word=False,
    ww_key_a=None,
    ww_key_b=None,
    ww_len=None,
    ww_id=None,
    ww_seed=0,
):
    """uint8[B,L] bytes + int32[B] lengths -> (ids int32[B,L], ntok int32[B]).

    Token ids are left-packed per row; positions >= ntok[i] are -1.

    `boundary` selects the pre-split rule set ("gpt2" or "llama3").
    `whole_word` enables the BPE `ignore_merges` bypass (reference
    `models/bpe/model.rs:475-497`): words whose double rolling hash hits the
    vocab word table emit their vocab id directly and skip the merge loop
    (ww_* arrays: cuckoo tables keyed on (h1, h2) -> (byte_len, id)).
    """
    B, L = bytes_u8.shape
    b = bytes_u8.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    inb = pos < lengths[:, None]
    b = jnp.where(inb, b, 0)

    if boundary == "gpt2":
        bnd, _ = gpt2_boundaries(b, inb, stage1, stage2)
    else:
        from .llama3_presplit import llama3_boundaries

        bnd, _ = llama3_boundaries(b, inb, stage1, stage2)

    word_id = jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1
    seg_start = bnd  # contiguous byte ranges per word

    ids0 = jnp.where(inb, byte2id[b], -1)

    nxt_ok = _shift_next(inb, False) & ~_shift_next(bnd, False)
    nxt0 = jnp.where(inb & nxt_ok, pos + 1, L)
    prv_ok = ~bnd  # first byte of word has no intra-word predecessor
    prv0 = jnp.where(inb & prv_ok & (pos > 0), pos - 1, L)
    alive_in = inb

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
        # last byte of each word: position before the next boundary
        BIG = np.int32(0x7FFFFFFF)
        nbp = jax.lax.cummin(
            jnp.where(bnd, pos, BIG), axis=1, reverse=True
        )
        nxt_bnd = _shift_next(nbp, BIG)
        end_pos = jnp.minimum(nxt_bnd, lengths[:, None]) - 1
        end_cl = jnp.clip(end_pos, 0, L - 1)
        wh1 = jnp.take_along_axis(h1, end_cl, axis=1).astype(jnp.int32)
        wh2 = jnp.take_along_axis(h2, end_cl, axis=1).astype(jnp.int32)
        wlen = end_pos - pos + 1
        wwmask = ww_key_a.shape[1] - 1
        g0 = hash_jnp(wh1, wh2, ww_seed, wwmask, 0)
        g1 = hash_jnp(wh1, wh2, ww_seed, wwmask, 1)
        hit0 = (ww_key_a[0][g0] == wh1) & (ww_key_b[0][g0] == wh2)
        hit1 = (ww_key_a[1][g1] == wh1) & (ww_key_b[1][g1] == wh2)
        stored_len = jnp.where(hit0, ww_len[0][g0], ww_len[1][g1])
        stored_id = jnp.where(hit0, ww_id[0][g0], ww_id[1][g1])
        ww_hit = bnd & (hit0 | hit1) & (stored_len == wlen) & (wlen > 1)
        # word head takes the vocab id; the rest of the word dies.
        # forward-fill the hit flag across the word's bytes:
        f = jnp.where(bnd, ww_hit.astype(jnp.int32), -1)

        def op_fill(x, y):
            (v1,), (v2,) = x, y
            return (jnp.where(v2 >= 0, v2, v1),)

        (filled,) = jax.lax.associative_scan(op_fill, (f,), axis=1)
        word_is_hit = (filled == 1) & inb
        ids0 = jnp.where(bnd & ww_hit, stored_id, ids0)
        alive_in = inb & (~word_is_hit | bnd)
        nxt0 = jnp.where(bnd & ww_hit, L, nxt0)

    pad_col = lambda x, v: jnp.concatenate(
        [x, jnp.full((B, 1), v, x.dtype)], axis=1
    )
    ids0 = pad_col(ids0, -1)
    nxt0 = pad_col(nxt0, L)
    prv0 = pad_col(prv0, L)
    alive0 = pad_col(alive_in, False)
    seg_startp = pad_col(seg_start, True)

    tables = (key_a, key_b, rank, new_id)
    ka, kb, rk, nw = tables
    mask = ka.shape[1] - 1

    def lookup(a, bb, valid):
        h0 = hash_jnp(a, bb, seed, mask, 0)
        h1 = hash_jnp(a, bb, seed, mask, 1)
        hit0 = (ka[0][h0] == a) & (kb[0][h0] == bb)
        hit1 = (ka[1][h1] == a) & (kb[1][h1] == bb)
        r = jnp.where(hit0, rk[0][h0], jnp.where(hit1, rk[1][h1], INF))
        n = jnp.where(hit0, nw[0][h0], nw[1][h1])
        return jnp.where(valid, r, INF), n

    ids, alive = _merge_loop_impl(ids0, nxt0, prv0, alive0, seg_startp, lookup)

    aliveL = alive[:, :L]
    idsL = ids[:, :L]
    k = jnp.cumsum(aliveL.astype(jnp.int32), axis=1) - 1
    ntok = jnp.where(aliveL, k + 1, 0).max(axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
    scatter_idx = jnp.where(aliveL, k, L)
    out = jnp.full((B, L + 1), -1, jnp.int32)
    out = out.at[rows, scatter_idx].set(idsL)
    result = (out[:, :L], ntok)
    if with_word_ids:
        wout = jnp.full((B, L + 1), -1, jnp.int32)
        wout = wout.at[rows, scatter_idx].set(word_id)
        result = result + (wout[:, :L],)
    return result
