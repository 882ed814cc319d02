"""TPU Unigram (SentencePiece) encode: Nmt + Metaspace + Viterbi DP.

One jitted program over packed uint8[B, L] byte batches replacing the
reference hot path (`models/unigram/model.rs:240-329` forward DP,
`normalizers/unicode.rs:44-77` Nmt, `pre_tokenizers/metaspace.rs`):

1.  **Normalize + Metaspace** (fused, per char): Nmt filters control chars
    and maps whitespace-likes to space; `Replace(" {2,}" -> " ")` drops a
    space whose previous surviving char is a space; Metaspace turns each
    space into `▁` (3 bytes) and prepends one when the output doesn't start
    with it.  One class-table gather + byte scatters into [B, L2].
2.  **Pre-split**: every `▁` begins a word (MergedWithNext).
3.  **Viterbi forward DP** as one `lax.scan` over the byte axis with a
    sliding window of pending path candidates — the reference's exact
    semantics: at each reached char boundary every matching piece (cuckoo
    rolling-hash lookups, log-probs) extends the path; a later candidate
    replaces only on *strictly greater* score (first-writer tie rule);
    missing single chars fall back to `unk_id` at `min_score - 10.0`.
4.  **Backtrack without gathers**: back-jumps are bounded by the max piece
    byte length, so the token chain is resolved with shift-selects —
    iterate token steps from each word-end boundary; consecutive unk
    tokens fuse into one (`fuse_unk`).

Scores are float32 on device (the reference uses f64); conformance fuzzing
gates this — ties that flip under f32 would surface as test mismatches.
Rows with words over the char cap are flagged for host fallback.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_merge2 import _shift_next, _shift_prev, fill_prev
from .merge_table import hash_jnp
from .wordpiece_encode import H1_MULT, H2_MULT, _decode_chars

NEG = np.float32(-1e30)
MAX_TOKENS_PER_WORD = 64  # dedup-path backtrack bound; longer words -> host
BT_CAP = 512  # x64-path backtrack cap (while_loop: typical cost ~10 iters)

CLS_KEEP = 0
CLS_SPACE = 1
CLS_DELETE = 2

_nmt_cache = None


def nmt_metaspace_class_table():
    """Per-codepoint class table for the fused Nmt + space pipeline."""
    global _nmt_cache
    if _nmt_cache is not None:
        return _nmt_cache
    from ..normalizers import Nmt

    cls = np.zeros(0x110000, np.int8)
    for cp in Nmt._FILTERED:
        cls[cp] = CLS_DELETE
    for cp in Nmt._TO_SPACE:
        cls[cp] = CLS_SPACE
    cls[0x20] = CLS_SPACE
    pages = cls.reshape(-1, 256)
    uniq, s1 = np.unique(pages, axis=0, return_inverse=True)
    _nmt_cache = (s1.astype(np.int32), uniq.reshape(-1).astype(np.int8))
    return _nmt_cache


def normalize_metaspace(bytes_u8, lengths, cls_s1, cls_s2, with_src):
    """Stage 1 (Nmt + space collapse + Metaspace) shared by the dense and
    packed programs: -> (nb, wbnd, ninb, total, row_bad, src_char|None)
    over [B, L2] with L2 = 2L + 4."""
    B, L = bytes_u8.shape
    L2 = L * 2 + 4
    b = bytes_u8.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    inb = pos < lengths[:, None]
    b = jnp.where(inb, b, 0)

    cp, is_start, charlen = _decode_chars(b, inb)
    from .merge_table import take_row8

    page = take_row8(cp >> 8, cls_s1)
    cls = jnp.where(
        is_start,
        take_row8((page << 8) | (cp & 255), cls_s2).astype(jnp.int32),
        CLS_DELETE,
    )
    surv = is_start & (cls != CLS_DELETE)
    # Replace(" {2,}" -> " ") keeps the LAST space of a run: the reference's
    # replacement char carries the span of the final matched character, so
    # a space whose next surviving char is a space is dropped.
    from .bpe_merge2 import fill_next as _fill_next

    (ncls,), nfnd = _fill_next(
        [cls], surv, k_steps=max(1, (L - 1).bit_length())
    )
    collapsed = (cls == CLS_SPACE) & nfnd & (ncls == CLS_SPACE)
    cls = jnp.where(collapsed, CLS_DELETE, cls)

    keep = is_start & (cls == CLS_KEEP)
    space = is_start & (cls == CLS_SPACE)
    out_len = jnp.where(keep, charlen, jnp.where(space, 3, 0))
    first_pos = jnp.min(jnp.where(surv & ~collapsed, pos, L), axis=1)
    first_cls = jnp.take_along_axis(
        cls, jnp.clip(first_pos, 0, L - 1)[:, None], axis=1
    )[:, 0]
    prepend = (first_pos < L) & (first_cls != CLS_SPACE)
    base = jnp.where(prepend, 3, 0)

    opos = base[:, None] + jnp.cumsum(out_len, axis=1) - out_len
    total = base + jnp.sum(out_len, axis=1)
    row_bad = total > L2

    rows = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
    JUNK = L2 + 3
    nb = jnp.zeros((B, L2 + 4), jnp.uint8)
    wbnd = jnp.zeros((B, L2 + 4), bool)  # word-start marks (each ▁)
    META = (0xE2, 0x96, 0x81)
    for k, v in enumerate(META):
        nb = nb.at[:, k].set(jnp.where(prepend, np.uint8(v), nb[:, k]))
    wbnd = wbnd.at[:, 0].max(prepend)
    for k, v in enumerate(META):
        tgt = jnp.where(space, opos + k, JUNK)
        nb = nb.at[rows, tgt].set(jnp.where(space, np.uint8(v), 0), mode="drop")
    wbnd = wbnd.at[rows, jnp.where(space, opos, JUNK)].max(space, mode="drop")
    for k in range(4):
        src = _shift_next(b, 0, k) if k else b
        mask = keep & (k < charlen)
        tgt = jnp.where(mask, opos + k, JUNK)
        nb = nb.at[rows, tgt].set(
            jnp.where(mask, src, 0).astype(jnp.uint8), mode="drop"
        )
    nb = nb[:, :L2].astype(jnp.int32)
    wbnd = wbnd[:, :L2]
    npos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)
    ninb = npos < total[:, None]
    nb = jnp.where(ninb, nb, 0)

    src_char = None
    if with_src:
        # source char per normalized byte (prepended ▁ backfills from the
        # first emitting char, matching NormalizedString.prepend alignment)
        in_char_idx = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
        emit = is_start & (out_len > 0)
        srcm = jnp.full((B, L2 + 4), -1, jnp.int32)
        srcm = srcm.at[rows, jnp.where(emit, opos, JUNK)].set(
            jnp.where(emit, in_char_idx, -1), mode="drop"
        )[:, :L2]

        def op_src(a, c):
            (v1,), (v2,) = a, c
            return (jnp.where(v2 >= 0, v2, v1),)

        (src_char,) = jax.lax.associative_scan(op_src, (srcm,), axis=1)

        def op_src_r(a, c):
            (v1,), (v2,) = a, c
            return (jnp.where(v2 >= 0, v2, v1),)

        (back,) = jax.lax.associative_scan(
            op_src_r, (src_char,), axis=1, reverse=True
        )
        src_char = jnp.where(src_char >= 0, src_char, back)
        src_char = jnp.where(ninb, jnp.maximum(src_char, 0), 0)

    return nb, wbnd, ninb, total, row_bad, src_char


def byte_fallback_expand(emit, jlen, node_id, unk_id, bf_tab, nb, inb, K):
    """Boundary-space emissions [R, C+1] -> byte-space emissions [R, C]
    with `<0xXX>` expansion of unk spans (`unigram/model.rs:429-446`):
    non-unk tokens emit at their start byte; each emitted (fused) unk span
    emits one byte token per covered normalized byte, every one carrying
    the whole span's extent.  `bf_tab` is the complete int32[256]
    byte-value -> token-id table (engines only build it when all 256
    pieces exist, so per-span existence checks are vacuous).

    Returns (ids_b, st_b, en_b, emit_b) over [R, C]: token id, span start
    byte (row-local), exclusive span end byte, emission mask."""
    from .bpe_encode import take256

    R = emit.shape[0]
    C = emit.shape[1] - 1
    ids_b = jnp.full((R, C + 1), -1, jnp.int32)
    len_b = jnp.zeros((R, C + 1), jnp.int32)
    for d in range(1, K + 1):
        m = _shift_next((emit & (jlen == d)).astype(jnp.int32), 0, d) == 1
        ids_b = jnp.where(m, _shift_next(node_id, -1, d), ids_b)
        len_b = jnp.where(m, d, len_b)
    ids_b = ids_b[:, :C]
    len_b = len_b[:, :C]
    start = ids_b >= 0
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)

    # forward-fill (id, start) of the covering token over word bytes
    def op_ff(a, c):
        (i1, s1, f1), (i2, s2, f2) = a, c
        return (
            jnp.where(f2, i2, i1),
            jnp.where(f2, s2, s1),
            f1 | f2,
        )

    cov_id, cov_st, cov_set = jax.lax.associative_scan(
        op_ff,
        (
            jnp.where(start, ids_b, -1),
            jnp.where(start, pos, 0),
            start,
        ),
        axis=1,
    )
    # exclusive end of the covering (possibly unk-fused) span: the next
    # emission start or dead position strictly after p — tokens tile words,
    # so that is exactly where the span ends (a fused run's interior unk
    # pieces were removed and mint no start marks)
    C_BIG = jnp.int32(C)
    mark = jnp.where(start | ~inb, pos, C_BIG)
    nxt_mark = jax.lax.cummin(mark, axis=1, reverse=True)
    en_next = _shift_next(nxt_mark, C_BIG)
    isbf = inb & cov_set & (cov_id == unk_id)
    emit_b = inb & (isbf | (start & (ids_b != unk_id)))
    bf_ids = take256(jnp.clip(nb, 0, 255), bf_tab)
    ids_out = jnp.where(isbf, bf_ids, jnp.where(emit_b, ids_b, -1))
    st_b = jnp.where(isbf, cov_st, pos)
    en_b = jnp.where(isbf, en_next, pos + len_b)
    st_b = jnp.where(emit_b, st_b, 0)
    en_b = jnp.where(emit_b, en_b, 0)
    return ids_out, st_b, en_b, emit_b


@functools.partial(jax.jit, static_argnames=("max_len", "with_offsets"))
def unigram_program(
    bytes_u8,
    lengths,
    cls_s1,
    cls_s2,
    vkey_a,
    vkey_b,
    vlen,
    vid,
    vscore,
    vseed,
    pow1,
    pow2,
    unk_id,
    unk_score,
    max_len,
    with_offsets=False,
    bf_tab=None,
):
    """-> (ids int32[B, OUT], ntok int32[B], row_bad bool[B])."""
    B, L = bytes_u8.shape
    L2 = L * 2 + 4
    nb, wbnd, ninb, total, row_bad, src_char = normalize_metaspace(
        bytes_u8, lengths, cls_s1, cls_s2, with_offsets
    )
    npos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)

    # ---- stage 2: piece scores per (position, length) --------------------
    _, nstart, nclen = _decode_chars(nb, ninb)

    def prefix_hash(mult):
        def op(x, y):
            (a1, c1), (a2, c2) = x, y
            return a1 * a2, c1 * a2 + c2

        a0 = jnp.full((B, L2), mult)
        c0 = (nb + 1).astype(jnp.uint32)
        _, hh = jax.lax.associative_scan(op, (a0, c0), axis=1)
        # E[i] over width L2 + max_len + 1: substring hashes come from
        # STATIC slices (e = npos + l, static l) — take_along_axis costs
        # ~10ns per index on this backend
        return jnp.concatenate(
            [jnp.zeros((B, 1), jnp.uint32), hh,
             jnp.zeros((B, max_len), jnp.uint32)],
            axis=1,
        )

    E1 = prefix_hash(H1_MULT)
    E2 = prefix_hash(H2_MULT)
    E1_base = E1[:, :L2]
    E2_base = E2[:, :L2]

    BIGP = jnp.int32(0x7FFFFFFF)
    nxt_b = jax.lax.cummin(jnp.where(wbnd, npos, BIGP), axis=1, reverse=True)
    nxt_bnd = _shift_next(nxt_b, BIGP)
    wend = jnp.minimum(nxt_bnd, total[:, None]) - 1  # last byte of word

    vmask = vkey_a.shape[1] - 1
    s_ok = ninb & nstart
    sdtype = vscore.dtype  # float64 under the engine's enable_x64 scope
    NEGS = jnp.asarray(NEG, sdtype)
    costs = []
    pids = []
    for l in range(1, max_len + 1):
        valid = s_ok & ((npos + l - 1) <= wend)
        h1 = (E1[:, l : l + L2] - E1_base * pow1[l]).astype(jnp.int32)
        h2 = (E2[:, l : l + L2] - E2_base * pow2[l]).astype(jnp.int32)
        g0 = hash_jnp(h1, h2, vseed, vmask, 0)
        g1 = hash_jnp(h1, h2, vseed, vmask, 1)
        hit0 = (vkey_a[0][g0] == h1) & (vkey_b[0][g0] == h2)
        hit1 = (vkey_a[1][g1] == h1) & (vkey_b[1][g1] == h2)
        stored_l = jnp.where(hit0, vlen[0][g0], vlen[1][g1])
        stored_id = jnp.where(hit0, vid[0][g0], vid[1][g1])
        stored_sc = jnp.where(hit0, vscore[0][g0], vscore[1][g1])
        hit = valid & (hit0 | hit1) & (stored_l == l)
        costs.append(jnp.where(hit, stored_sc, NEGS))
        pids.append(jnp.where(hit, stored_id, -1))
    cost = jnp.stack(costs, axis=-1)  # [B, L2, max_len]
    pid = jnp.stack(pids, axis=-1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 2) + 1
    # unk fallback: exactly the char length, only when no piece of that
    # length matched here (reference `has_single_node`)
    has_single = jnp.any((lidx == nclen[..., None]) & (cost > NEGS / 2), axis=-1)
    unk_here = s_ok & ~has_single
    unk_sel = unk_here[..., None] & (lidx == nclen[..., None])
    cost = jnp.where(unk_sel, jnp.asarray(unk_score, sdtype), cost)
    pid = jnp.where(unk_sel, unk_id, pid)

    # ---- stage 3: forward DP (lax.scan over byte positions) --------------
    # boundary q: nodes (score, piece-start, piece-id) of the best path
    # ending at exclusive byte offset q.  Sliding window `pend[j]` holds the
    # best candidate so far for boundary (q + j); processing order makes the
    # reference's first-writer tie rule automatic (replace only on >).
    cost_t = jnp.transpose(cost, (1, 0, 2))  # [L2, B, K]
    pid_t = jnp.transpose(pid, (1, 0, 2))
    bnd_t = jnp.transpose(wbnd, (1, 0))  # [L2, B]
    pos_t = jax.lax.broadcasted_iota(jnp.int32, (L2, B), 0)

    K = max_len

    def step(carry, x):
        pend_sc, pend_st, pend_id = carry  # [B, K]
        cost_row, pid_row, bnd_row, q_row = x
        # node emitted for boundary q (pieces ending here)
        node = (pend_sc[:, 0], pend_st[:, 0], pend_id[:, 0])
        # path score available at byte q for outgoing pieces
        dp_here = jnp.where(bnd_row, jnp.float32(0), pend_sc[:, 0])
        # shift window: slot j now corresponds to boundary q + 1 + j
        sh_sc = jnp.concatenate([pend_sc[:, 1:], jnp.full((B, 1), NEG)], axis=1)
        sh_st = jnp.concatenate(
            [pend_st[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1
        )
        sh_id = jnp.concatenate(
            [pend_id[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1
        )
        # push pieces starting at q: piece of length l lands in slot l-1
        cand = dp_here[:, None] + cost_row
        ok = (cost_row > NEG / 2) & (dp_here > NEG / 2)[:, None]
        better = ok & (cand > sh_sc)
        new_sc = jnp.where(better, cand, sh_sc)
        new_st = jnp.where(better, q_row[:, None], sh_st)
        new_id = jnp.where(better, pid_row, sh_id)
        return (new_sc, new_st, new_id), node

    init = (
        jnp.full((B, K), NEG, sdtype),
        jnp.full((B, K), -1, jnp.int32),
        jnp.full((B, K), -1, jnp.int32),
    )
    (fin_sc, fin_st, fin_id), outs = jax.lax.scan(
        step, init, (cost_t, pid_t, bnd_t, pos_t)
    )
    # node arrays over boundaries 0..L2 (boundary q = bytes [0, q))
    node_st = jnp.concatenate(
        [jnp.transpose(outs[1], (1, 0)), fin_st[:, :1]], axis=1
    )
    node_id = jnp.concatenate(
        [jnp.transpose(outs[2], (1, 0)), fin_id[:, :1]], axis=1
    )

    # word-size guard for the bounded backtrack: char count at the word's
    # last byte via reverse nearest-flag fill (no take_along_axis)
    char_idx = jnp.cumsum(nstart.astype(jnp.int32), axis=1)
    is_last_b = ninb & (npos == wend)

    def op_rfill(a, c):
        # reverse=True flips the array, so the SECOND operand is nearer
        (v1, s1), (v2, s2) = a, c
        return jnp.where(s2, v2, v1), s1 | s2

    cend, _ = jax.lax.associative_scan(
        op_rfill,
        (jnp.where(is_last_b, char_idx, 0), is_last_b),
        axis=1,
        reverse=True,
    )
    wchars = cend - char_idx + 1
    row_bad = row_bad | jnp.any(wbnd & (wchars > BT_CAP), axis=1)

    # ---- stage 4: backtrack via bounded shift steps ----------------------
    # boundary-space arrays [B, L2+1]; jump(q) = node_st[q] (<= K back).
    jlen = jnp.where(node_st >= 0,
                     jax.lax.broadcasted_iota(jnp.int32, (B, L2 + 1), 1) - node_st,
                     0)  # piece byte length at boundary q (0 = none)
    # seeds: every word-end boundary — i.e. every word-head boundary (the
    # end of the previous word) plus each row's total. Per-word chains are
    # then <= MAX_TOKENS_PER_WORD steps.
    seed = jnp.concatenate([wbnd, jnp.zeros((B, 1), bool)], axis=1)
    rowsB = jax.lax.broadcasted_iota(jnp.int32, (B, L2 + 1), 0)
    seed = seed.at[jnp.arange(B), total].set(True)
    def bt_cond(st):
        reach, front, i = st
        return jnp.any(front) & (i < BT_CAP)

    def bt_body(st):
        reach, front, i = st
        # next front: boundary q - jlen[q] for q in front (jlen <= K;
        # _shift_next(x, d)[i] = x[i+d], i.e. a mark at q lands at q-d)
        nxt = jnp.zeros((B, L2 + 1), bool)
        for d in range(1, K + 1):
            m = front & (jlen == d)
            nxt = nxt | _shift_next(m, False, d)
        front = nxt & ~reach
        return reach | front, front, i + 1

    # data-dependent trip count: the chain depth is the max tokens in any
    # word, typically ~10 — a fixed MAX_TOKENS_PER_WORD fori_loop paid 64
    # rounds ALWAYS and still flagged >64-char words (URLs: 25% of corpus
    # docs) to the host.  The while form stops when the front empties, so
    # the cap can be generous (BT_CAP) at no typical-case cost.
    reach, _, _ = jax.lax.while_loop(
        bt_cond, bt_body, (seed, seed, jnp.int32(0))
    )

    tok = reach & (node_st >= 0) & (jlen > 0)

    # ---- fuse_unk --------------------------------------------------------
    # previous token ends at boundary node_st[q]; same word iff node_st[q]
    # is not this token's word head.  head byte of the word containing byte
    # (q-1): forward-fill head positions over bytes.
    hsrc = jnp.where(wbnd, npos, jnp.where(ninb, -3, -1))

    def op_head(a, c):
        (v1,), (v2,) = a, c
        return (jnp.where(v2 == -3, v1, v2),)

    (headb,) = jax.lax.associative_scan(op_head, (hsrc,), axis=1)
    head_of = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), headb], axis=1
    )  # head_of[q] = word head byte for boundary q (byte q-1's word)

    prev_id = jnp.zeros((B, L2 + 1), jnp.int32) - 1
    for d in range(1, K + 1):
        m = tok & (jlen == d)
        # id of token ending at q-d
        prev_id = jnp.where(
            m, _shift_prev(node_id, -1, d), prev_id
        )
    prev_is_tok = jnp.zeros((B, L2 + 1), bool)
    for d in range(1, K + 1):
        m = tok & (jlen == d)
        prev_is_tok = prev_is_tok | (m & _shift_prev(tok, False, d))
    first_of_word = tok & (node_st == head_of)
    fused_away = (
        tok
        & (node_id == unk_id)
        & ~first_of_word
        & prev_is_tok
        & (prev_id == unk_id)
    )
    emit = tok & ~fused_away

    if bf_tab is not None:
        # byte_fallback: emissions move to byte space, unk spans expand
        ids_b, st_b, en_b, emit_b = byte_fallback_expand(
            emit, jlen, node_id, unk_id, bf_tab, nb, ninb, K
        )
        rowsL = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 0)
        kb = jnp.cumsum(emit_b.astype(jnp.int32), axis=1) - 1
        ntok = jnp.where(emit_b, kb + 1, 0).max(axis=1)
        out_w = L2 // 2
        sc_idx = jnp.where(emit_b, jnp.minimum(kb, out_w), out_w)

        def packbf(x, fill=-1):
            return (
                jnp.full((B, out_w + 1), fill, jnp.int32)
                .at[rowsL, sc_idx]
                .set(jnp.where(emit_b, x, fill))[:, :out_w]
            )

        out = packbf(ids_b)
        row_bad = row_bad | (ntok > out_w)
        if not with_offsets:
            return out, ntok, row_bad
        starts_p = packbf(st_b, fill=0)
        ends_p = packbf(en_b, fill=0)
        tpos = jax.lax.broadcasted_iota(jnp.int32, starts_p.shape, 1)
        in_tok = tpos < ntok[:, None]
        src_pad = jnp.concatenate(
            [src_char, jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        st_char = jnp.take_along_axis(
            src_pad, jnp.clip(starts_p, 0, L2), axis=1
        )
        en_char = (
            jnp.take_along_axis(
                src_pad, jnp.clip(ends_p - 1, 0, L2), axis=1
            )
            + 1
        )
        st_char = jnp.where(in_tok, st_char, 0)
        en_char = jnp.where(in_tok, en_char, 0)
        headb_pad = jnp.concatenate(
            [headb, jnp.full((B, 1), -1, jnp.int32)], axis=1
        )
        head_at_start = jnp.take_along_axis(
            headb_pad, jnp.clip(starts_p, 0, L2), axis=1
        )
        new_word = (
            head_at_start != _shift_prev(head_at_start, -3)
        ) & in_tok
        word_idx = jnp.where(
            in_tok, jnp.cumsum(new_word.astype(jnp.int32), axis=1) - 1, -1
        )
        return out, ntok, row_bad, st_char, en_char, word_idx

    # ---- compact ---------------------------------------------------------
    k = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    ntok = jnp.where(emit, k + 1, 0).max(axis=1)
    out_w = L2 // 2
    scatter_idx = jnp.where(emit, jnp.minimum(k, out_w), out_w)

    def packb(x, fill=-1):
        return (
            jnp.full((B, out_w + 1), fill, jnp.int32)
            .at[rowsB, scatter_idx]
            .set(jnp.where(emit, x, fill))[:, :out_w]
        )

    out = packb(node_id)
    row_bad = row_bad | (ntok > out_w)
    if not with_offsets:
        return out, ntok, row_bad

    # token extents in normalized-byte space: start = node_st at the emitted
    # boundary; end = next token's start within the word, else word end + 1
    # (this also gives fused-unk runs their full span)
    bpos = jax.lax.broadcasted_iota(jnp.int32, (B, L2 + 1), 1)
    starts_p = packb(node_st, fill=0)
    # head of the word containing the token start:
    headb_pad = jnp.concatenate([headb, jnp.full((B, 1), -1, jnp.int32)], axis=1)
    head_at_start = jnp.take_along_axis(
        headb_pad, jnp.clip(starts_p, 0, L2), axis=1
    )
    tpos = jax.lax.broadcasted_iota(jnp.int32, starts_p.shape, 1)
    in_tok = tpos < ntok[:, None]
    n_starts = jnp.concatenate(
        [starts_p[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    n_heads = jnp.concatenate(
        [head_at_start[:, 1:], jnp.full((B, 1), -2, jnp.int32)], axis=1
    )
    # word end (exclusive) for the word containing the token start
    wend_pad = jnp.concatenate([wend, jnp.full((B, 1), -1, jnp.int32)], axis=1)
    wend_at = (
        jnp.take_along_axis(wend_pad, jnp.clip(starts_p, 0, L2), axis=1) + 1
    )
    ends_p = jnp.where(
        in_tok & (n_heads == head_at_start) & _shift_next(in_tok, False),
        n_starts,
        wend_at,
    )
    ends_p = jnp.where(in_tok, ends_p, 0)
    # normalized bytes -> original chars
    src_pad = jnp.concatenate([src_char, jnp.zeros((B, 1), jnp.int32)], axis=1)
    st_char = jnp.take_along_axis(src_pad, jnp.clip(starts_p, 0, L2), axis=1)
    en_char = (
        jnp.take_along_axis(src_pad, jnp.clip(ends_p - 1, 0, L2), axis=1) + 1
    )
    st_char = jnp.where(in_tok, st_char, 0)
    en_char = jnp.where(in_tok, en_char, 0)
    new_word = (head_at_start != _shift_prev(head_at_start, -3)) & in_tok
    word_idx = jnp.where(
        in_tok, jnp.cumsum(new_word.astype(jnp.int32), axis=1) - 1, -1
    )
    return out, ntok, row_bad, st_char, en_char, word_idx
