"""Word-packed Unigram Viterbi: sequential depth = packed-row width.

The dense Viterbi (`unigram_encode.unigram_program`) scans one byte
position per `lax.scan` step over the [B, 2L] normalized grid — 16k+
sequential steps per chunk, each paying this backend's fixed per-op cost
(~0.25 MB/s measured on the bench).  But the DP is sequential only WITHIN
words (path score resets at every ▁), so this program repacks words into a
[RU, UC=512] buffer (words never cross rows, same slack trick as
bpe_dedup) and scans over the 512 packed columns: the sequential depth is
a CONSTANT while batch size only grows rows — throughput scales with
chunk size instead of being capped by scan steps.

The backtrack is one REVERSE scan over the same columns carrying a
K-boundary window of pending marks (replacing the dense path's
bounded shift-loop backtrack), and token output rides monotone
butterfly routes (`ops/route.py`) back to per-input-row order.

Semantics are identical to the dense program (the CPU oracle): same f64
first-writer-tie DP, same unk fallback + fuse_unk; words over PACK_SLACK bytes flag their
input row for host fallback (a superset of the dense path's BT_CAP-chars
guard).  Fuzzed against the dense path and the wheel in
tests/test_device_unigram_engine.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_dedup import g_excl_cumsum
from .bpe_merge2 import _shift_next, _shift_prev
from .merge_table import hash_jnp
from .route import compact_left, route_to
from .unigram_encode import NEG, normalize_metaspace
from .wordpiece_encode import H1_MULT, H2_MULT, _decode_chars

UC = 512  # packed row width = Viterbi scan depth
PACK_SLACK = 256  # max word bytes on this path (64 chars x 4 <= 256)
UCEFF = UC - PACK_SLACK


def _pack_geometry(BL2):
    ru = -(-(BL2) // UCEFF)  # worst case: every byte survives packing
    return ru


@functools.partial(jax.jit, static_argnames=("max_len", "with_offsets"))
def unigram_program_packed(
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
    """Drop-in for `unigram_program` (same signature/returns)."""
    B, L = bytes_u8.shape
    L2 = L * 2 + 4
    nb, wbnd, ninb, total, row_bad, src_char = normalize_metaspace(
        bytes_u8, lengths, cls_s1, cls_s2, with_offsets
    )
    npos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 0)

    # ---- word extents + per-input-row guards ------------------------------
    BIGP = jnp.int32(0x7FFFFFFF)
    nxt_b = jax.lax.cummin(jnp.where(wbnd, npos, BIGP), axis=1, reverse=True)
    nxt_bnd = _shift_next(nxt_b, BIGP)
    wend_d = jnp.minimum(nxt_bnd, total[:, None])  # exclusive word end
    wlen_d = wend_d - npos  # valid at heads
    _, nstart_d, _ = _decode_chars(nb, ninb)
    cidx_d = jnp.cumsum(nstart_d.astype(jnp.int32), axis=1)
    # chars per word at heads (reverse nearest-flag fill from word-last)
    is_last_d = ninb & (npos == wend_d - 1)

    def op_rfill(a, c):
        (v1, s1), (v2, s2) = a, c
        return jnp.where(s2, v2, v1), s1 | s2

    cend_d, _ = jax.lax.associative_scan(
        op_rfill, (jnp.where(is_last_d, cidx_d, 0), is_last_d), axis=1,
        reverse=True,
    )
    # only the packing slack bounds word size: the reverse-scan backtrack
    # has no per-word token cap (jumps are bounded by max piece length),
    # and a word within the byte slack can never exceed the dense path's
    # BT_CAP chars (chars <= bytes <= PACK_SLACK < BT_CAP) — so packed
    # bad rows are a superset of the dense path's (capacity-only)
    row_long = jnp.any(wbnd & (wlen_d > PACK_SLACK), axis=1)
    row_bad = row_bad | row_long

    # ---- pack words into [RU, UC] -----------------------------------------
    live = ninb & ~row_long[:, None]  # bad rows' bytes stay out entirely
    # packed target: word-base offset (uceff rows + slack) + intra offset
    ulen = jnp.where(wbnd & live, wlen_d, 0)
    goff = g_excl_cumsum(ulen)  # word start offset in the packed stream
    urow = goff // UCEFF
    uflat_h = urow * UC + (goff - urow * UCEFF)

    # forward-fill (head flat target, head position) over word bytes
    def op_ff(a, c):
        (t1, h1, s1), (t2, h2, s2) = a, c
        return (
            jnp.where(s2, t2, t1),
            jnp.where(s2, h2, h1),
            s1 | s2,
        )

    tgt_h, head_pos, _ = jax.lax.associative_scan(
        op_ff,
        (
            jnp.where(wbnd, uflat_h, 0),
            jnp.where(wbnd, npos, 0),
            wbnd,
        ),
        axis=1,
    )
    tgt = tgt_h + (npos - head_pos)

    RU = _pack_geometry(B * L2)
    onorm = rowi * L2 + npos  # original flat normalized position
    vals = [nb, wbnd.astype(jnp.int32), rowi, onorm]
    fills = (0, 0, -1, -1)

    # wrap-mode routing keeps the input's column width, so reshape the
    # [B, L2] grid to UC-wide rows first (pad columns to a UC multiple;
    # row-major reshape preserves flat order)
    L2p = -(-L2 // UC) * UC

    def to_uc(x, fill):
        if L2p != L2:
            x = jnp.concatenate(
                [x, jnp.full((B, L2p - L2), fill, x.dtype)], axis=1
            )
        return x.reshape(B * L2p // UC, UC)

    vals_r = tuple(to_uc(v, f) for v, f in zip(vals, fills))
    live_r = to_uc(live.astype(jnp.int32), 0) > 0
    tgt_r = to_uc(tgt, 0)
    out_v, live_o = route_to(
        vals_r, live_r, jnp.where(live_r, tgt_r, 0), fills,
        wrap=True, n_out=RU * UC,
    )
    nbp = jnp.where(live_o, out_v[0], 0)
    uheadp = live_o & (out_v[1] > 0)
    rowidxp = jnp.where(live_o, out_v[2], -1)
    onormp = jnp.where(live_o, out_v[3], -1)
    ninbp = live_o
    upos = jax.lax.broadcasted_iota(jnp.int32, (RU, UC), 1)

    # ---- stage 2 on the packed grid: piece scores -------------------------
    _, nstartp, nclenp = _decode_chars(nbp, ninbp)

    def prefix_hash(mult):
        def op(x, y):
            (a1, c1), (a2, c2) = x, y
            return a1 * a2, c1 * a2 + c2

        a0 = jnp.full((RU, UC), mult)
        c0 = (nbp + 1).astype(jnp.uint32)
        _, hh = jax.lax.associative_scan(op, (a0, c0), axis=1)
        return jnp.concatenate(
            [jnp.zeros((RU, 1), jnp.uint32), hh,
             jnp.zeros((RU, max_len), jnp.uint32)],
            axis=1,
        )

    E1 = prefix_hash(H1_MULT)
    E2 = prefix_hash(H2_MULT)
    E1_base = E1[:, :UC]
    E2_base = E2[:, :UC]

    nxt_hp = jax.lax.cummin(
        jnp.where(uheadp, upos, BIGP), axis=1, reverse=True
    )
    # a packed row's live span can start past column 0 (a word spilling
    # into the previous row's slack leaves a leading hole), so the row end
    # is the last live column + 1, not the live count
    rowend = jnp.max(jnp.where(ninbp, upos + 1, 0), axis=1)
    wendp = jnp.minimum(_shift_next(nxt_hp, BIGP), rowend[:, None]) - 1

    vmask = vkey_a.shape[1] - 1
    s_ok = ninbp & nstartp
    sdtype = vscore.dtype
    NEGS = jnp.asarray(NEG, sdtype)
    costs = []
    pids = []
    for l in range(1, max_len + 1):
        valid = s_ok & ((upos + l - 1) <= wendp)
        h1 = (E1[:, l : l + UC] - E1_base * pow1[l]).astype(jnp.int32)
        h2 = (E2[:, l : l + UC] - E2_base * pow2[l]).astype(jnp.int32)
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
    cost = jnp.stack(costs, axis=-1)  # [RU, UC, K]
    pid = jnp.stack(pids, axis=-1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 2) + 1
    has_single = jnp.any(
        (lidx == nclenp[..., None]) & (cost > NEGS / 2), axis=-1
    )
    unk_here = s_ok & ~has_single
    unk_sel = unk_here[..., None] & (lidx == nclenp[..., None])
    cost = jnp.where(unk_sel, jnp.asarray(unk_score, sdtype), cost)
    pid = jnp.where(unk_sel, unk_id, pid)

    # ---- stage 3: forward DP over the 512 packed columns -------------------
    cost_t = jnp.transpose(cost, (1, 0, 2))  # [UC, RU, K]
    pid_t = jnp.transpose(pid, (1, 0, 2))
    bnd_t = jnp.transpose(uheadp, (1, 0))
    pos_t = jax.lax.broadcasted_iota(jnp.int32, (UC, RU), 0)
    K = max_len

    def step(carry, x):
        pend_sc, pend_st, pend_id = carry  # [RU, K]
        cost_row, pid_row, bnd_row, q_row = x
        node = (pend_sc[:, 0], pend_st[:, 0], pend_id[:, 0])
        dp_here = jnp.where(bnd_row, jnp.asarray(0, sdtype), pend_sc[:, 0])
        sh_sc = jnp.concatenate(
            [pend_sc[:, 1:], jnp.full((RU, 1), NEG, sdtype)], axis=1
        )
        sh_st = jnp.concatenate(
            [pend_st[:, 1:], jnp.full((RU, 1), -1, jnp.int32)], axis=1
        )
        sh_id = jnp.concatenate(
            [pend_id[:, 1:], jnp.full((RU, 1), -1, jnp.int32)], axis=1
        )
        cand = dp_here[:, None] + cost_row
        ok = (cost_row > NEG / 2) & (dp_here > NEG / 2)[:, None]
        better = ok & (cand > sh_sc)
        new_sc = jnp.where(better, cand, sh_sc)
        new_st = jnp.where(better, q_row[:, None], sh_st)
        new_id = jnp.where(better, pid_row, sh_id)
        return (new_sc, new_st, new_id), node

    init = (
        jnp.full((RU, K), NEG, sdtype),
        jnp.full((RU, K), -1, jnp.int32),
        jnp.full((RU, K), -1, jnp.int32),
    )
    (fin_sc, fin_st, fin_id), outs = jax.lax.scan(
        step, init, (cost_t, pid_t, bnd_t, pos_t)
    )
    node_st = jnp.concatenate(
        [jnp.transpose(outs[1], (1, 0)), fin_st[:, :1]], axis=1
    )  # [RU, UC + 1]
    node_id = jnp.concatenate(
        [jnp.transpose(outs[2], (1, 0)), fin_id[:, :1]], axis=1
    )

    # ---- stage 4: backtrack = ONE reverse scan with a K-window -------------
    bposp = jax.lax.broadcasted_iota(jnp.int32, (RU, UC + 1), 1)
    jlen = jnp.where(node_st >= 0, bposp - node_st, 0)
    # seeds: every word-head boundary (end of the previous word) + each
    # packed row's fill boundary
    seed = jnp.concatenate([uheadp, jnp.zeros((RU, 1), bool)], axis=1)
    seed = seed | (bposp == rowend[:, None])

    seed_t = jnp.transpose(seed, (1, 0))  # [UC+1, RU]
    jlen_t = jnp.transpose(jlen, (1, 0))

    def bt_step(pend, x):
        # pend[:, j] marks boundary (q - j); slot 0 = current q
        seed_q, jlen_q = x
        reach_q = seed_q | (pend[:, 0] > 0)
        sl = jax.lax.broadcasted_iota(jnp.int32, (RU, K + 1), 1)
        mark = (sl == jlen_q[:, None]) & reach_q[:, None]
        pend = pend | mark.astype(jnp.int32)
        pend = jnp.concatenate(
            [pend[:, 1:], jnp.zeros((RU, 1), jnp.int32)], axis=1
        )
        return pend, reach_q

    _, reach_t = jax.lax.scan(
        bt_step,
        jnp.zeros((RU, K + 1), jnp.int32),
        (seed_t, jlen_t),
        reverse=True,
    )
    reach = jnp.transpose(reach_t, (1, 0))
    tok = reach & (node_st >= 0) & (jlen > 0)

    # ---- fuse_unk (packed-grid port of the dense logic) --------------------
    hsrc = jnp.where(uheadp, upos, jnp.where(ninbp, -3, -1))

    def op_head(a, c):
        (v1,), (v2,) = a, c
        return (jnp.where(v2 == -3, v1, v2),)

    (headb,) = jax.lax.associative_scan(op_head, (hsrc,), axis=1)
    head_of = jnp.concatenate(
        [jnp.full((RU, 1), -1, jnp.int32), headb], axis=1
    )  # word-head COLUMN per boundary (same-row comparisons only)
    # globally-unique word key (head columns repeat across packed rows)
    rowbase = jax.lax.broadcasted_iota(jnp.int32, (RU, UC), 0) * UC
    head_flat = jnp.where(headb >= 0, rowbase + headb, -1)
    head_key = jnp.concatenate(
        [jnp.full((RU, 1), -1, jnp.int32), head_flat], axis=1
    )
    prev_id = jnp.zeros((RU, UC + 1), jnp.int32) - 1
    prev_is_tok = jnp.zeros((RU, UC + 1), bool)
    for d in range(1, K + 1):
        m = tok & (jlen == d)
        prev_id = jnp.where(m, _shift_prev(node_id, -1, d), prev_id)
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

    # exclusive word-end in ORIGINAL flat space, delivered per byte via a
    # reverse nearest-flag fill from each word's last byte
    is_wlast = ninbp & (upos == wendp)

    def op_rf2(a, c):
        (v1, s1), (v2, s2) = a, c
        return jnp.where(s2, v2, v1), s1 | s2

    wend_onorm_b, _ = jax.lax.associative_scan(
        op_rf2,
        (jnp.where(is_wlast, onormp + 1, 0), is_wlast),
        axis=1,
        reverse=True,
    )
    # at boundary q: word end for the token ending at q = value at byte q-1
    wend_orig = _shift_prev(
        jnp.concatenate(
            [wend_onorm_b, jnp.zeros((RU, 1), jnp.int32)], axis=1
        ),
        0, 1,
    )

    # ---- route tokens back to per-input-row outputs ------------------------
    # token attributes at emitted boundaries (boundary q ends at byte q-1)
    tok_row = _shift_prev(
        jnp.concatenate([rowidxp, jnp.full((RU, 1), -1, jnp.int32)], axis=1),
        -1, 1,
    )  # rowidx of byte q-1 at boundary q

    # token start's original position: onorm at packed byte node_st[q]
    # (node_st = q - jlen, jlen <= K: bounded back-shifts)
    onorm_pad = jnp.concatenate(
        [onormp, jnp.zeros((RU, 1), jnp.int32)], axis=1
    )
    st_orig = jnp.zeros((RU, UC + 1), jnp.int32)
    for d in range(1, K + 1):
        m = emit & (jlen == d)
        st_orig = jnp.where(m, _shift_prev(onorm_pad, 0, d), st_orig)

    if bf_tab is not None:
        # byte_fallback: emissions move to byte space (one token per byte
        # of each unk span), with explicit span extents in original flat
        # normalized space
        from .unigram_encode import byte_fallback_expand

        ids_b, st_b, en_b, emit_sel = byte_fallback_expand(
            emit, jlen, node_id, unk_id, bf_tab, nbp, ninbp, K
        )
        vals_tok = (
            ids_b,
            jnp.where(emit_sel, rowidxp, -1),
            jnp.where(emit_sel, onormp - (upos - st_b), 0),
            jnp.where(emit_sel, onormp + (en_b - upos), 0),  # excl. end
            jnp.where(emit_sel, head_flat, -1),
        )
    else:
        emit_sel = emit
        vals_tok = (
            jnp.where(emit, node_id, -1),
            jnp.where(emit, tok_row, -1),
            st_orig,
            jnp.where(emit, wend_orig, 0),  # word end (fused spans use this)
            jnp.where(emit, head_key, -1),  # globally-unique word key
        )
    fills_tok = (-1, -1, 0, 0, -1)
    comp, tcount = compact_left(vals_tok, emit_sel, fills_tok, wrap=True)
    c_id, c_row, c_st, c_en, c_head = comp
    # rank within input row: global rank - first rank of that row
    flatp = (
        jax.lax.broadcasted_iota(jnp.int32, c_id.shape, 0) * (UC + 1)
        + jax.lax.broadcasted_iota(jnp.int32, c_id.shape, 1)
    )
    in_tok = flatp < tcount
    row_first = in_tok & (c_row != _shift_prev_flat(c_row, -1))
    # forward fill of the first-token flat index per input row, across
    # packed-row boundaries (row-major)
    g_first = _ffill_rm(jnp.where(row_first, flatp, 0), row_first)
    rank = flatp - g_first
    out_w = L2 // 2
    tgt_out = jnp.where(
        in_tok & (rank < out_w),
        c_row * out_w + rank,
        B * out_w,
    )
    n_out = B * out_w
    # pad/reshape the compacted stream to rows of out_w for the wrap spread
    tot_c = c_id.shape[0] * c_id.shape[1]
    g_rows = -(-tot_c // out_w)

    def reshape_ow(x, fill):
        flat = x.reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.full((g_rows * out_w - tot_c,), fill, x.dtype)]
        )
        return flat.reshape(g_rows, out_w)

    spread_vals = tuple(
        reshape_ow(v, f)
        for v, f in zip((c_id, c_st, c_en, c_head, c_row), (-1, 0, 0, -1, -1))
    )
    tgt_r = reshape_ow(tgt_out, n_out)
    live_r = reshape_ow(in_tok.astype(jnp.int32), 0) > 0
    ok_r = live_r & (tgt_r < n_out)
    (o_id, o_st, o_en, o_head, o_row), live_out = route_to(
        spread_vals,
        ok_r,
        jnp.where(ok_r, tgt_r, 0),
        (-1, 0, 0, -1, -1),
        wrap=True,
        n_out=n_out,
    )
    o_id = o_id.reshape(-1)[:n_out].reshape(B, out_w)
    live_out = live_out.reshape(-1)[:n_out].reshape(B, out_w)
    ids_out = jnp.where(live_out, o_id, -1)

    # per-input-row token counts + overflow guard
    ntok = jnp.sum(live_out.astype(jnp.int32), axis=1)
    over = in_tok & (rank >= out_w)
    over_rows = (
        jnp.zeros((B + 1,), jnp.int32)
        .at[jnp.where(over.reshape(-1), jnp.clip(c_row.reshape(-1), 0, B), B)]
        .max(over.reshape(-1).astype(jnp.int32))[:B]
    )
    row_bad = row_bad | (over_rows > 0)
    if not with_offsets:
        return ids_out, ntok, row_bad

    o_st = jnp.where(live_out, o_st.reshape(-1)[:n_out].reshape(B, out_w), 0)
    o_en = jnp.where(live_out, o_en.reshape(-1)[:n_out].reshape(B, out_w), 0)
    o_head = jnp.where(
        live_out, o_head.reshape(-1)[:n_out].reshape(B, out_w), -1
    )
    if bf_tab is not None:
        # byte_fallback tokens carry explicit exclusive span ends
        ends_flat = o_en
    else:
        # end = next token's start within the same word (covers fused-unk
        # spans), else the word's exclusive end — the dense path's rule
        n_starts = _shift_next(o_st, 0)
        n_keys = _shift_next(o_head, -2)
        n_live = _shift_next(live_out.astype(jnp.int32), 0) > 0
        ends_flat = jnp.where(
            live_out & n_live & (n_keys == o_head), n_starts, o_en
        )
    # original positions are flat (row * L2 + npos): localize
    st_loc = o_st - o_st // L2 * L2
    en_b = ends_flat - 1
    en_loc = en_b - en_b // L2 * L2 + 1
    en_loc = jnp.where(live_out, en_loc, 0)
    st_loc = jnp.where(live_out, st_loc, 0)
    # normalized-byte extents -> original char indices via src_char
    src_pad = jnp.concatenate(
        [src_char, jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    st_char = jnp.take_along_axis(src_pad, jnp.clip(st_loc, 0, L2), axis=1)
    en_char = (
        jnp.take_along_axis(src_pad, jnp.clip(en_loc - 1, 0, L2 - 1), axis=1)
        + 1
    )
    st_char = jnp.where(live_out, st_char, 0)
    en_char = jnp.where(live_out, en_char, 0)
    new_word = (o_head != _shift_prev(o_head, -3)) & live_out
    word_idx = jnp.where(
        live_out, jnp.cumsum(new_word.astype(jnp.int32), axis=1) - 1, -1
    )
    return ids_out, ntok, row_bad, st_char, en_char, word_idx


def _shift_prev_flat(x, fill):
    """Row-major flat shift by one (previous element, crossing rows)."""
    R, C = x.shape
    col = jnp.concatenate(
        [jnp.full((R, 1), fill, x.dtype), x[:, :-1]], axis=1
    )
    wrap = jnp.concatenate(
        [jnp.full((1, 1), fill, x.dtype), x[:-1, -1:]], axis=0
    )
    return col.at[:, 0].set(wrap[:, 0])


def _ffill_rm(v, isset):
    """Row-major forward fill of v at isset positions across the whole
    [R, C] grid (per-row scan + row-carry fix-up)."""

    def op(a, c):
        (v1, s1), (v2, s2) = a, c
        return jnp.where(s2, v2, v1), s1 | s2

    vf, sf = jax.lax.associative_scan(op, (v, isset), axis=1)
    # carry the last set value of each row down to later rows
    last_v = vf[:, -1]
    last_s = sf[:, -1]
    cv, cs = jax.lax.associative_scan(op, (last_v, last_s), axis=0)
    carry_v = jnp.concatenate([jnp.zeros((1,), v.dtype), cv[:-1]])
    carry_s = jnp.concatenate([jnp.zeros((1,), jnp.bool_), cs[:-1]])
    return jnp.where(sf, vf, jnp.where(carry_s[:, None], carry_v[:, None], 0))
