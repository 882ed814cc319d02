"""TPU WordPiece encode: BertNormalizer + BertPreTokenizer + longest-match.

One jitted program over packed uint8[B, L] byte batches replacing the
reference hot path (`models/wordpiece/mod.rs:224-283` longest-match scan,
`normalizers/bert.rs`, `pre_tokenizers/bert.rs`):

1.  **Normalize**: per-char table gather (see `bert_tables.py`) + scatter
    into a [B, L2] normalized byte tensor (L2 = 2L; rows that would overflow
    — pathological, none for real text — are flagged for host fallback).
2.  **Pre-split**: whitespace chars die, punctuation chars become single-char
    words, other runs become words (char-class table; no regex).
3.  **Longest match**: rolling prefix hashes give O(1) substring hashes; for
    every in-word position the longest vocab hit (with the `##` continuation
    flag mixed into the key) is found by sweeping candidate byte lengths
    against a cuckoo vocab table.  The greedy token chain `s -> s + m[s]`
    is resolved for all words at once by pointer doubling.  Unmatched
    positions or words longer than `max_input_chars_per_word` collapse to
    whole-word [UNK], exactly like the reference.

Hash-equality stands in for string equality (two independent 32-bit rolling
hashes + exact length; collision odds ~2^-64 per candidate pair).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .bert_tables import BERT_PUNCT, BERT_WS, NORM_K
from .bpe_encode import _shift_next, _shift_prev
from .merge_table import hash_jnp

H1_MULT = np.uint32(0x01000193)
H2_MULT = np.uint32(0x0000C597)
CONT_MIX1 = np.int32(np.uint32(0x5BD1E995).astype(np.int32))
CONT_MIX2 = np.int32(np.uint32(0x2545F491).astype(np.int32))
BIG = np.int32(0x7FFFFFFF)


def _decode_chars(b, inb):
    """(cp, is_start, charlen) for packed utf-8 bytes."""
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
    cp = jnp.where(
        charlen == 1,
        b,
        jnp.where(
            charlen == 2,
            ((b & 0x1F) << 6) | (b1 & 0x3F),
            jnp.where(
                charlen == 3,
                ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F),
                ((b & 0x07) << 18)
                | ((b1 & 0x3F) << 12)
                | ((b2 & 0x3F) << 6)
                | (b3 & 0x3F),
            ),
        ),
    )
    return jnp.clip(cp, 0, 0x10FFFF), is_start, charlen


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_len", "max_word_chars", "expand", "with_offsets", "ascii_only",
    ),
)
def wordpiece_program(
    bytes_u8,
    lengths,
    norm_s1,
    norm_ob,
    norm_ol,
    cls_s1,
    cls_s2,
    vrows0,
    vrows1,
    vseed,
    pow1,
    pow2,
    unk_id,
    max_len,
    max_word_chars,
    expand=2,
    with_offsets=False,
    ascii_only=False,
    ascii_nb=None,
    ascii_cls=None,
):
    """-> (ids int32[B, L2], ntok int32[B], row_bad bool[B]).

    row_bad rows must be re-encoded on the host (normalization overflow).

    `ascii_only` (static; caller guarantees all bytes < 128): normalization
    is a 256-entry byte map (`ascii_nb`, 255 = dropped char) applied on the
    MXU + one butterfly compaction, and char classes come from `ascii_cls`
    — no UTF-8 decode, no NORM_K scatter loop, no big-table gathers, and
    the normalized buffer stays at width L (expand=1)."""
    B, L = bytes_u8.shape
    L2 = L * expand
    b = bytes_u8.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    inb = pos < lengths[:, None]
    b = jnp.where(inb, b, 0)

    if ascii_only:
        # ---- stage 1+2 (ascii): elementwise map + compaction ------------
        from .bpe_encode import take256
        from .route import compact_left

        assert expand == 1
        ob = take256(b, ascii_nb)
        keep = inb & (ob != 255)
        if with_offsets:
            (nb, src_char), total = compact_left(
                (ob, pos), keep, (0, -1)
            )
        else:
            (nb,), total = compact_left((ob,), keep, (0,))
        npos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)
        ninb = npos < total[:, None]
        nb = jnp.where(ninb, nb, 0)
        if with_offsets:
            src_char = jnp.where(ninb, src_char, -1)
        row_bad = jnp.zeros((B,), bool)
        nstart = ninb
        cls = jnp.where(ninb, take256(nb, ascii_cls), -1)
        cls_fill = cls
    else:
        # ---- stage 1: normalize ------------------------------------------
        cp, is_start, _ = _decode_chars(b, inb)
        from .merge_table import take_row8

        page = take_row8(cp >> 8, norm_s1)
        tidx = (page << 8) | (cp & 255)
        olen = jnp.where(is_start, take_row8(tidx, norm_ol).astype(jnp.int32), 0)
        row_bad = jnp.any(olen < 0, axis=1)
        olen = jnp.maximum(olen, 0)
        opos = jnp.cumsum(olen, axis=1) - olen  # exclusive
        total = jnp.sum(olen, axis=1)
        row_bad = row_bad | (total > L2)

        rows = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
        nb = jnp.zeros((B, L2 + NORM_K), jnp.uint8)
        # one [T, NORM_K] ROW gather for all K output bytes (a row costs
        # ~3.2 ns regardless of width; the old per-k flat gather paid
        # ~8 ns x NORM_K per position)
        ob_rows = norm_ob[tidx]
        for k in range(NORM_K):
            tgt = jnp.where((k < olen) & is_start, opos + k, L2 + NORM_K - 1)
            nb = nb.at[rows, tgt].set(
                jnp.where((k < olen) & is_start, ob_rows[..., k], 0).astype(
                    jnp.uint8
                ),
                mode="drop",
            )
        nb = nb[:, :L2].astype(jnp.int32)
        npos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)
        ninb = npos < total[:, None]
        nb = jnp.where(ninb, nb, 0)

        if with_offsets:
            # source char index per normalized byte: scatter each input
            # char's index at its output start, then forward-fill
            in_char_idx = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
            srcm = jnp.full((B, L2 + NORM_K), -1, jnp.int32)
            emit = is_start & (olen > 0)
            srcm = srcm.at[
                rows, jnp.where(emit, opos, L2 + NORM_K - 1)
            ].set(jnp.where(emit, in_char_idx, -1), mode="drop")
            srcm = srcm[:, :L2]

            def op_src(a, c):
                (v1,), (v2,) = a, c
                return (jnp.where(v2 >= 0, v2, v1),)

            (src_char,) = jax.lax.associative_scan(op_src, (srcm,), axis=1)
            src_char = jnp.where(ninb, src_char, -1)

        # ---- stage 2: bert pre-split -------------------------------------
        cp2, nstart, _ = _decode_chars(nb, ninb)
        pg2 = take_row8(cp2 >> 8, cls_s1)
        cls = take_row8((pg2 << 8) | (cp2 & 255), cls_s2).astype(jnp.int32)
        # per-byte class fill
        f = jnp.where(nstart, cls, -1)
        for _ in range(3):
            f = jnp.where(f >= 0, f, _shift_prev(f, -1))
        cls_fill = f
    is_ws_b = (cls_fill == BERT_WS) & ninb
    in_word = ninb & ~is_ws_b
    prev_cls = jnp.where(npos == 0, -2, _shift_prev(cls_fill, -2))
    bnd = nstart & ~is_ws_b & (
        (cls == BERT_PUNCT)
        | (prev_cls == BERT_WS)
        | (prev_cls == BERT_PUNCT)
        | (prev_cls == -2)
    )
    # word extent: up to the byte before the next head/ws/end
    marker = bnd | is_ws_b | ~ninb
    nxt_marker = jax.lax.cummin(
        jnp.where(marker, npos, BIG), axis=1, reverse=True
    )
    nxt_after = _shift_next(nxt_marker, BIG)
    wend = jnp.minimum(nxt_after, total[:, None]) - 1  # valid at word bytes
    # word head position forward-filled across word bytes (ws resets)
    h = jnp.where(bnd, npos, jnp.where(is_ws_b | ~ninb, -1, -3))

    def op_head(a, c):
        # "rightmost non-transparent wins"; -3 is the identity element
        (v1,), (v2,) = a, c
        return (jnp.where(v2 == -3, v1, v2),)

    (headp,) = jax.lax.associative_scan(op_head, (h,), axis=1)
    headp = jnp.where(in_word & (headp >= 0), headp, -1)

    # chars per word (max_input_chars_per_word, reference wordpiece :225)
    # char count at the word's end, via reverse fill from word-last bytes
    # (take_along_axis costs ~10ns/index on this backend; scans don't)
    char_idx = jnp.cumsum(nstart.astype(jnp.int32), axis=1)
    is_last_b = ninb & _shift_next(marker, True)

    def op_rfill(a, c):
        # reverse=True reverses the array then scans forward, so the SECOND
        # operand is the element nearer to the output position: it wins.
        (v1, s1), (v2, s2) = a, c
        return jnp.where(s2, v2, v1), s1 | s2

    cend, _ = jax.lax.associative_scan(
        op_rfill,
        (jnp.where(is_last_b, char_idx, 0), is_last_b),
        axis=1,
        reverse=True,
    )
    wchars = cend - char_idx + 1
    long_word = bnd & (wchars > max_word_chars)

    # ---- stage 3: longest match -----------------------------------------
    # exclusive prefix hashes E[i] = hash(nb[0:i]); substring hashes come
    # from STATIC shifts of E (e = npos + l with static l), never from
    # take_along_axis (which costs per index on this backend)
    def prefix_hash(mult):
        def op(x, y):
            (a1, c1), (a2, c2) = x, y
            return a1 * a2, c1 * a2 + c2

        a0 = jnp.full((B, L2), mult)
        c0 = (nb + 1).astype(jnp.uint32)
        _, hh = jax.lax.associative_scan(op, (a0, c0), axis=1)
        # E[i] over width L2 + max_len + 1 (tail zeros are masked by valid)
        return jnp.concatenate(
            [jnp.zeros((B, 1), jnp.uint32), hh,
             jnp.zeros((B, max_len), jnp.uint32)],
            axis=1,
        )

    E1 = prefix_hash(H1_MULT)
    E2 = prefix_hash(H2_MULT)
    E1_base = E1[:, :L2]
    E2_base = E2[:, :L2]

    vmask = vrows0.shape[0] - 1
    cont = in_word & nstart & ~bnd
    mix1 = jnp.where(cont, CONT_MIX1, 0)
    mix2 = jnp.where(cont, CONT_MIX2, 0)

    m = jnp.zeros((B, L2), jnp.int32)
    mid = jnp.zeros((B, L2), jnp.int32)
    s_ok = in_word & nstart
    for l in range(1, max_len + 1):
        valid = s_ok & ((npos + l - 1) <= wend)
        h1 = (E1[:, l : l + L2] - E1_base * pow1[l]).astype(jnp.int32) ^ mix1
        h2 = (E2[:, l : l + L2] - E2_base * pow2[l]).astype(jnp.int32) ^ mix2
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

    # ---- greedy chain via pointer doubling -------------------------------
    SINK = L2  # chain terminator / failure sink
    nxt = jnp.where(s_ok & (m > 0), npos + m, SINK)
    nxt = jnp.clip(nxt, 0, L2)
    reach = jnp.concatenate([bnd & ~long_word, jnp.zeros((B, 1), bool)], axis=1)
    jump = jnp.concatenate([nxt, jnp.full((B, 1), SINK, jnp.int32)], axis=1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (B, L2 + 1), 0)
    # 2^k must cover the max tokens-per-word chain length; one token is at
    # least one char, so max_word_chars bounds it (default 100 -> k=7).
    # Early-exit while_loop: real chains are short (~2-4 tokens/word), so
    # typically 2-3 doublings suffice; each costs a scatter + gather.
    k_dbl = max(7, int(max_word_chars).bit_length())

    def dbl_cond(state):
        _reach, _jump, more, it = state
        return more & (it < k_dbl)

    def dbl_body(state):
        reach, jump, _more, it = state
        stepped = jnp.zeros((B, L2 + 1), bool).at[rows2, jump].max(reach)
        stepped = stepped.at[:, SINK].set(False)
        grew = jnp.any(stepped & ~reach)
        reach = reach | stepped
        jump = jnp.take_along_axis(jump, jump, axis=1)
        return reach, jump, grew, it + 1

    reach, jump, _, _ = jax.lax.while_loop(
        dbl_cond, dbl_body, (reach, jump, jnp.bool_(True), jnp.int32(0))
    )
    reach = reach[:, :L2]

    # failure: a reached in-word position with no match -> whole word [UNK]
    fail_pos = (reach & s_ok & (m == 0)) | long_word
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 0)
    word_fail = jnp.zeros((B, L2 + 1), bool).at[
        rows3, jnp.where(fail_pos & (headp >= 0), headp, L2)
    ].max(fail_pos)[:, :L2]
    # broadcast word_fail (at heads) back over the word
    wf = jnp.where(bnd, word_fail, False)
    fword = jnp.where(bnd, wf.astype(jnp.int32), jnp.where(in_word, -3, -1))

    def op_f(a, c):
        (v1,), (v2,) = a, c
        return (jnp.where(v2 == -3, v1, v2),)

    (ffill,) = jax.lax.associative_scan(op_f, (fword,), axis=1)
    in_fail_word = in_word & (ffill == 1)

    token = (reach & ~in_fail_word & (m > 0)) | (bnd & in_fail_word)
    out_id = jnp.where(in_fail_word, unk_id, mid)

    # ---- compact ---------------------------------------------------------
    k = jnp.cumsum(token.astype(jnp.int32), axis=1) - 1
    ntok = jnp.where(token, k + 1, 0).max(axis=1)
    scatter_idx = jnp.where(token, k, L2)
    out = jnp.full((B, L2 + 1), -1, jnp.int32)
    out = out.at[rows3, scatter_idx].set(out_id)
    if not with_offsets:
        return out[:, :L2], ntok, row_bad

    def pack(x, fill=0):
        return (
            jnp.full((B, L2 + 1), fill, jnp.int32)
            .at[rows3, scatter_idx]
            .set(x)[:, :L2]
        )

    # token extents in normalized-byte space: a token starts at its own
    # position; for [UNK] word tokens the span is the whole word
    tok_start_n = jnp.where(in_fail_word, headp, npos)
    tok_end_n = jnp.zeros((B, L2), jnp.int32)
    # end = next token's start in the same word, else wend + 1
    starts_p = pack(tok_start_n)
    words_p = pack(jnp.where(headp >= 0, headp, 0), fill=-2)
    wend_p = pack(jnp.clip(wend, 0, L2 - 1))
    n_starts = jnp.concatenate(
        [starts_p[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    n_words = jnp.concatenate(
        [words_p[:, 1:], jnp.full((B, 1), -2, jnp.int32)], axis=1
    )
    tpos = jax.lax.broadcasted_iota(jnp.int32, starts_p.shape, 1)
    in_tok = tpos < ntok[:, None]
    ends_p = jnp.where(
        in_tok & (n_words == words_p) & _shift_next(in_tok, False),
        n_starts,
        wend_p + 1,
    )
    ends_p = jnp.where(in_tok, ends_p, 0)
    # map normalized-byte extents to original char indices
    src_pad = jnp.concatenate([src_char, jnp.zeros((B, 1), jnp.int32)], axis=1)
    st_char = jnp.take_along_axis(
        src_pad, jnp.clip(starts_p, 0, L2), axis=1
    )
    en_char = (
        jnp.take_along_axis(src_pad, jnp.clip(ends_p - 1, 0, L2), axis=1) + 1
    )
    st_char = jnp.where(in_tok, st_char, 0)
    en_char = jnp.where(in_tok, en_char, 0)
    # word index per token: dense-rank the word head positions
    head_tok = words_p
    new_word = (head_tok != _shift_prev(head_tok, -3)) & in_tok
    word_idx = jnp.cumsum(new_word.astype(jnp.int32), axis=1) - 1
    word_idx = jnp.where(in_tok, word_idx, -1)
    return out[:, :L2], ntok, row_bad, st_char, en_char, word_idx
