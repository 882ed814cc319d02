"""WordPiece over the batch word-dedup machinery (ASCII fast path).

WordPiece, like BPE, is a pure per-word function — so for ASCII chunks
(the overwhelming serving case for BERT-style models) the engine reuses
`bpe_dedup`'s layout/expansion: normalize (256-entry MXU byte map +
butterfly compaction), BERT pre-split boundaries, `dedup_layout` to elect
one representative per distinct word, this module's longest-match encoder
over the unique buffer (typically 15-25% of the text), and
`_finish_expand` to route tokens back — with the persistent cross-batch
word cache for free.  The candidate-length sweep and greedy chain then
run over a quarter of the bytes.

Non-ASCII chunks use the dense `wordpiece_program` (NORM_K expansion
needs the scatter path); it is also the conformance oracle for this one
(tests/test_wordpiece_dedup.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_dedup import buffer_geometry, dedup_finish, dedup_layout
from .bpe_encode import _shift_next, _shift_prev, take256
from .bert_tables import BERT_PUNCT, BERT_WS
from .merge_table import hash_jnp
from .route import compact_left
from .wordpiece_encode import CONT_MIX1, CONT_MIX2


def wordpiece_unique_encoder(
    vrows0, vrows1, vseed, pow1, pow2, unk_id, max_len, max_word_chars
):
    """encode_fn for `dedup_finish`: longest-match + greedy chain over the
    unique-word buffer.  ASCII bytes only (1 char = 1 byte)."""

    def encode(b_u, uhead, inb_u, wid_u, wend_f, upos_f):
        ru, uc = b_u.shape
        npos = jax.lax.broadcasted_iota(jnp.int32, (ru, uc), 1)

        # word extents in-row: wend_f/upos_f are FLAT (row*uc + col); the
        # word-end column is their difference from the row base
        wend_col = wend_f - (upos_f - npos) - 1  # last byte column

        # ---- candidate-length sweep (static-slice rolling hashes) -----
        from .wordpiece_encode import H1_MULT, H2_MULT

        def prefix_hash(mult):
            def op(x, y):
                (a1, c1), (a2, c2) = x, y
                return a1 * a2, c1 * a2 + c2

            a0 = jnp.full((ru, uc), mult)
            c0 = (b_u + 1).astype(jnp.uint32)
            _, hh = jax.lax.associative_scan(op, (a0, c0), axis=1)
            return jnp.concatenate(
                [jnp.zeros((ru, 1), jnp.uint32), hh,
                 jnp.zeros((ru, max_len), jnp.uint32)],
                axis=1,
            )

        E1 = prefix_hash(H1_MULT)
        E2 = prefix_hash(H2_MULT)
        E1b = E1[:, :uc]
        E2b = E2[:, :uc]

        vmask = vrows0.shape[0] - 1
        s_ok = inb_u  # every ASCII byte is a char start
        cont = inb_u & ~uhead
        mix1 = jnp.where(cont, CONT_MIX1, 0)
        mix2 = jnp.where(cont, CONT_MIX2, 0)

        m = jnp.zeros((ru, uc), jnp.int32)
        mid = jnp.zeros((ru, uc), jnp.int32)
        for l in range(1, max_len + 1):
            valid = s_ok & ((npos + l - 1) <= wend_col)
            h1 = (E1[:, l : l + uc] - E1b * pow1[l]).astype(jnp.int32) ^ mix1
            h2 = (E2[:, l : l + uc] - E2b * pow2[l]).astype(jnp.int32) ^ mix2
            g0 = hash_jnp(h1, h2, vseed, vmask, 0)
            g1 = hash_jnp(h1, h2, vseed, vmask, 1)
            r0 = vrows0[g0]
            r1 = vrows1[g1]
            hit0 = (r0[..., 0] == h1) & (r0[..., 1] == h2)
            hit1 = (r1[..., 0] == h1) & (r1[..., 1] == h2)
            stored_l = jnp.where(hit0, r0[..., 2], r1[..., 2])
            stored_id = jnp.where(hit0, r0[..., 3], r1[..., 3])
            hit = valid & (hit0 | hit1) & (stored_l == l)
            m = jnp.where(hit, l, m)
            mid = jnp.where(hit, stored_id, mid)

        # words over the char cap collapse to whole-word [UNK] (ascii:
        # chars == bytes), reference wordpiece/mod.rs:225
        wlen_at = jnp.where(uhead, wend_col - npos + 1, 0)
        long_word = uhead & (wlen_at > max_word_chars)

        # ---- greedy chain via pointer doubling (early exit) ------------
        SINK = uc
        nxt = jnp.where(s_ok & (m > 0), npos + m, SINK)
        nxt = jnp.clip(nxt, 0, uc)
        reach = jnp.concatenate(
            [uhead & ~long_word, jnp.zeros((ru, 1), bool)], axis=1
        )
        jump = jnp.concatenate(
            [nxt, jnp.full((ru, 1), SINK, jnp.int32)], axis=1
        )
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (ru, uc + 1), 0)
        k_dbl = max(7, int(max_word_chars).bit_length())

        def dbl_cond(state):
            _r, _j, more, it = state
            return more & (it < k_dbl)

        def dbl_body(state):
            reach, jump, _m, it = state
            stepped = jnp.zeros((ru, uc + 1), bool).at[rows2, jump].max(reach)
            stepped = stepped.at[:, SINK].set(False)
            grew = jnp.any(stepped & ~reach)
            reach = reach | stepped
            jump = jnp.take_along_axis(jump, jump, axis=1)
            return reach, jump, grew, it + 1

        reach, _, _, _ = jax.lax.while_loop(
            dbl_cond, dbl_body,
            (reach, jump, jnp.bool_(True), jnp.int32(0)),
        )
        reach = reach[:, :uc]

        # failure: a reached position with no match -> whole word [UNK]
        # (scatter the fail flag to the word head, then forward-fill over
        # the word — the dense program's exact mechanism)
        fail_pos = (reach & s_ok & (m == 0)) | long_word
        hsrc = jnp.where(uhead, npos, jnp.where(inb_u, -3, -1))

        def op_hf(a, c):
            (v1,), (v2,) = a, c
            return (jnp.where(v2 == -3, v1, v2),)

        (headp,) = jax.lax.associative_scan(op_hf, (hsrc,), axis=1)
        rows3 = jax.lax.broadcasted_iota(jnp.int32, (ru, uc), 0)
        word_fail = jnp.zeros((ru, uc + 1), bool).at[
            rows3, jnp.where(fail_pos & (headp >= 0), headp, uc)
        ].max(fail_pos)[:, :uc]
        fhead = jnp.where(
            uhead, word_fail.astype(jnp.int32),
            jnp.where(inb_u, -3, -1),
        )
        (ffill,) = jax.lax.associative_scan(op_hf, (fhead,), axis=1)
        in_fail_word = inb_u & (ffill == 1)

        token = (reach & ~in_fail_word & (m > 0)) | (uhead & in_fail_word)
        out_id = jnp.where(in_fail_word, unk_id, mid)

        ids = jnp.where(token, out_id, -1)
        return ids, wid_u, jnp.zeros((), bool)

    return encode


def _wordpiece_dedup_core(
    bytes_u8,
    lengths,
    ascii_nb,
    ascii_cls,
    vrows0,
    vrows1,
    vseed,
    pow1,
    pow2,
    unk_id,
    max_len,
    max_word_chars,
    word_cache=False,
    cache_rows=None,
    cache_buf=None,
    cache_p=None,
):
    """ASCII chunks only: normalize + BERT pre-split + dedup'd
    longest-match.  -> (ids [B, L//2], ntok [B], row_bad [B]) plus the
    cache state when word_cache."""
    B, L = bytes_u8.shape
    b_in = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < lengths[:, None],
        bytes_u8.astype(jnp.int32),
        0,
    )

    # normalize: byte map (255 = dropped) + butterfly compaction
    ob = take256(b_in, ascii_nb)
    keep = (
        jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < lengths[:, None]
    ) & (ob != 255)
    (nb,), total = compact_left((ob,), keep, (0,))
    npos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    ninb = npos < total[:, None]
    nb = jnp.where(ninb, nb, 0)

    # BERT pre-split boundaries (ascii: per-byte classes)
    cls = jnp.where(ninb, take256(nb, ascii_cls), -1)
    is_ws_b = (cls == BERT_WS) & ninb
    in_word = ninb & ~is_ws_b
    prev_cls = jnp.where(npos == 0, -2, _shift_prev(cls, -2))
    bnd = ninb & ~is_ws_b & (
        (cls == BERT_PUNCT)
        | (prev_cls == BERT_WS)
        | (prev_cls == BERT_PUNCT)
        | (prev_cls == -2)
    )
    # word ids & extents over non-ws bytes; whitespace bytes are dead
    BIGP = jnp.int32(0x7FFFFFFF)
    marker = bnd | is_ws_b | ~ninb
    nbp = jax.lax.cummin(jnp.where(marker, npos, BIGP), axis=1, reverse=True)
    nxt_bnd = jnp.minimum(_shift_next(nbp, BIGP), total[:, None])

    # words longer than the buffer slack would corrupt the packing (they
    # still tokenize — to [UNK] past max_word_chars — but can't be laid
    # out): flag their input rows for host fallback
    from .bpe_merge2 import WORD_CAP

    row_long = jnp.any(bnd & ((nxt_bnd - npos) > WORD_CAP), axis=1)

    geom = buffer_geometry(B * L)
    out_w = max(L // 2, 64)
    if word_cache:
        # persistent cross-batch word cache (same epoch-reset contract as
        # the BPE path, bpe_encode._encode_core): when this batch could
        # overflow the token buffer, void all hits and rewind in-graph
        CAP = cache_buf.shape[0] - 1
        reset = cache_p + jnp.int32((B * L) // 2) > CAP
        crows_eff = jnp.where(reset, 0, cache_rows)
        p_eff = jnp.where(reset, jnp.int32(0), cache_p)
        cache = (crows_eff, reset)
        cstate = (crows_eff, cache_buf, p_eff)
    else:
        cache = None
        cstate = None
    # dedup_layout treats every in-`inb` byte as word content, so pass the
    # in-word mask as `inb` (ws bytes vanish like the dense pre-split);
    # long-word rows are excluded entirely
    fits, dops = dedup_layout(
        nb,
        bnd & ~row_long[:, None],
        in_word & ~row_long[:, None],
        jnp.where(row_long, 0, total),
        nxt_bnd,
        jnp.int32(vseed),
        geom,
        cache=cache,
    )
    encode = wordpiece_unique_encoder(
        vrows0, vrows1, vseed, pow1, pow2, unk_id, max_len, max_word_chars
    )

    def branch_fast(dops):
        r = dedup_finish(
            dops,
            nb,
            None,
            None,
            None,
            jnp.int32(vseed),
            None,
            out_w,
            geom,
            cache_state=cstate,
            encode_fn=encode,
        )
        return r if word_cache else (r, ())

    def branch_slow(dops):
        # unique buffer overflow (pathological): flag everything for host
        ids = jnp.full((B, out_w), -1, jnp.int32)
        ntok = jnp.zeros((B,), jnp.int32)
        bad = jnp.ones((B,), bool)
        return ((ids, ntok, bad), (cstate if word_cache else ()))

    (ids, ntok, bad), st = jax.lax.cond(fits, branch_fast, branch_slow, dops)
    bad = bad | row_long
    if word_cache:
        return ids, ntok, bad, st
    return ids, ntok, bad


wordpiece_dedup_program = functools.partial(
    jax.jit,
    static_argnames=("max_len", "max_word_chars", "word_cache"),
    donate_argnames=("cache_rows", "cache_buf", "cache_p"),
)(_wordpiece_dedup_core)


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "max_word_chars", "word_cache"),
    donate_argnames=("cache_rows", "cache_buf", "cache_p"),
)
def wordpiece_dedup_scan(
    bytes_u8,  # uint8[N, B, L]
    lengths,  # int32[N, B]
    ascii_nb,
    ascii_cls,
    vrows0,
    vrows1,
    vseed,
    pow1,
    pow2,
    unk_id,
    max_len,
    max_word_chars,
    word_cache=True,
    cache_rows=None,
    cache_buf=None,
    cache_p=None,
):
    """N same-shape ASCII chunks in ONE device dispatch via `lax.scan`,
    threading the persistent word cache through as the carry — the
    WordPiece analogue of `bpe_encode.encode_program_scan` (per-chunk
    dispatch costs ~10ms of transport on this backend; the scan pays it
    once, and each distinct word across the whole batch runs the
    candidate sweep + greedy chain exactly once)."""

    def step(carry, xs):
        buf, lens = xs
        if word_cache:
            crows, cbuf, p = carry
            ids, ntok, bad, st = _wordpiece_dedup_core(
                buf, lens, ascii_nb, ascii_cls, vrows0, vrows1, vseed,
                pow1, pow2, unk_id, max_len, max_word_chars,
                word_cache=True, cache_rows=crows, cache_buf=cbuf,
                cache_p=p,
            )
            return tuple(st), (ids, ntok, bad)
        ids, ntok, bad = _wordpiece_dedup_core(
            buf, lens, ascii_nb, ascii_cls, vrows0, vrows1, vseed,
            pow1, pow2, unk_id, max_len, max_word_chars,
        )
        return carry, (ids, ntok, bad)

    init = (cache_rows, cache_buf, cache_p) if word_cache else ()
    carry, (ids, ntok, bad) = jax.lax.scan(step, init, (bytes_u8, lengths))
    return ids, ntok, bad, carry
