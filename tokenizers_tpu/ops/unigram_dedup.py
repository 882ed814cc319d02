"""Unigram Viterbi over the batch word-dedup machinery (the TPU fast path).

Three problems with the round-2 packed program (`unigram_packed.py`) made
the bench print 0.0 MB/s on v5e, all fixed here:

1.  **f64 DP** — software-emulated on TPU.  The DP now runs in
    *compensated f32* (double-float (hi, lo) pairs, ~2^-47 relative error):
    every score comparison whose operands are closer than `TIE_EPS` is
    flagged and the affected word's input rows fall back to the host's
    exact f64 path, so token ids remain bit-exact vs the reference
    (`models/unigram/model.rs:240-329`) — the flag fires only for genuine
    ties (equal score multisets) and ~2^-47-level coincidences.
2.  **10 flat gathers per (position, length) probe** — each costs ~8 ns on
    this backend.  The vocab cuckoo tables are repacked as `[S, 8]` rows
    (key1, key2, len, id, score_hi, score_lo, 0, 0): one ~3.2 ns row
    gather per table per length.
3.  **Every word Viterbi'd at every occurrence** — unigram, like BPE and
    WordPiece, is a pure per-word function, so the probes + DP now run
    over `bpe_dedup`'s unique-word buffer (typically 15-25% of the text),
    with the persistent cross-batch word cache for free, and a `lax.scan`
    batches all same-shape chunks into one dispatch.

The f64 dense program (`unigram_encode.py`) remains the CPU oracle; this
path is fuzzed against it in tests/test_unigram_dedup.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_dedup import buffer_geometry, dedup_finish, dedup_layout
from .bpe_merge2 import _shift_next, _shift_prev
from .merge_table import hash_jnp
from .unigram_encode import (
    MAX_TOKENS_PER_WORD,
    NEG,
    normalize_metaspace,
)
from .wordpiece_encode import H1_MULT, H2_MULT, _decode_chars

# unique-buffer geometry: short rows keep the DP scan depth low (the scan
# is sequential over columns), the 128-byte slack bounds word length
UD_UC = 640
UD_SLACK = 128
UD_UCEFF = UD_UC - UD_SLACK

# Per-word patch records per chunk: flagged words (near-ties, words over
# UD_SLACK bytes) are host re-encoded INDIVIDUALLY instead of poisoning
# their input rows (r4: a ~1e-4 per-word flag rate x ~2.3k words/row made
# 40.8% of bench rows host work).  512 records cover ~50x the measured
# bench rate; overflow falls back to row-level badness.
PATCH_CAP = 512

# Near-tie guard: a Viterbi comparison |Δ| below the accumulated
# compensated-f32 error bound cannot be trusted against the host's f64
# order, so the word is flagged for host re-encode.  The bound scales with
# path length and score magnitude: each dd_add contributes ~2^-48 relative
# error and a path to column q has at most q+1 adds, so
#     eps(q, a, b) = (q + 2) * TIE_EPS_REL * (|a| + |b| + 1)
# over-approximates |dd - f64| for both compared paths (TIE_EPS_REL has
# ~8x margin over 2^-48).  The r4 ABSOLUTE eps of 1e-8 was ~1000x coarser
# than the true error for typical words and drove most of the false flags.
TIE_EPS_REL = np.float32(3e-14)


def unigram_geometry(bl):
    """(nw_cap, wc, uc, uceff, ru): word table like `buffer_geometry`,
    unique buffer reshaped for the column-scan DP."""
    nw_cap, wc, _uc, _uceff, _ru = buffer_geometry(bl)
    # small chunks dedup poorly (r4: a 16-doc chunk measured ~50% unique
    # normalized bytes and overflowed the bl/4 buffer -> whole-chunk host
    # fallback); give them half-of-stream capacity instead
    uraw = max(bl // (4 if bl >= (1 << 20) else 2), 1 << 10)
    ru = -(-uraw // UD_UCEFF)
    return nw_cap, wc, UD_UC, UD_UCEFF, ru


# ---------------------------------------------------------------------------
# compensated f32 (double-float) helpers — TwoSum / Fast2Sum chains
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):  # requires |a| >= |b| (or a == 0)
    s = a + b
    return s, b - (s - a)


def dd_add(h1, l1, h2, l2):
    """(h1, l1) + (h2, l2), renormalized."""
    s, e = _two_sum(h1, h2)
    e = e + (l1 + l2)
    return _fast_two_sum(s, e)


def dd_gt(h1, l1, h2, l2):
    return (h1 > h2) | ((h1 == h2) & (l1 > l2))


def dd_split(x64: np.ndarray):
    """f64 array -> (hi, lo) f32 arrays with hi + lo == fl32x2(x)."""
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# ---------------------------------------------------------------------------
# unique-word Viterbi encoder (dedup_finish encode_fn)
# ---------------------------------------------------------------------------


def unigram_unique_encoder(
    vrows0, vrows1, vseed, pow1, pow2, unk_id, unk_hi, unk_lo, max_len,
    bf_tab=None,
):
    """encode_fn for `dedup_finish`: forward DP + backtrack over the
    unique-word buffer.  Returns per-position bad flags (2D) marking words
    whose DP hit a score near-tie (host re-encode)."""

    def encode(b_u, uhead, inb_u, wid_u, wend_f, upos_f):
        ru, uc = b_u.shape
        npos = jax.lax.broadcasted_iota(jnp.int32, (ru, uc), 1)
        wend_col = wend_f - (upos_f - npos) - 1  # last byte column

        _, nstart, nclen = _decode_chars(b_u, inb_u)

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
        s_ok = inb_u & nstart
        NEG32 = jnp.float32(NEG)
        cost_h, cost_l, pids = [], [], []
        for l in range(1, max_len + 1):
            valid = s_ok & ((npos + l - 1) <= wend_col)
            h1 = (E1[:, l : l + uc] - E1b * pow1[l]).astype(jnp.int32)
            h2 = (E2[:, l : l + uc] - E2b * pow2[l]).astype(jnp.int32)
            g0 = hash_jnp(h1, h2, vseed, vmask, 0)
            g1 = hash_jnp(h1, h2, vseed, vmask, 1)
            r0 = vrows0[g0]
            r1 = vrows1[g1]
            hit0 = (r0[..., 0] == h1) & (r0[..., 1] == h2)
            hit1 = (r1[..., 0] == h1) & (r1[..., 1] == h2)
            sel = lambda k: jnp.where(hit0, r0[..., k], r1[..., k])  # noqa: E731
            hit = valid & (hit0 | hit1) & (sel(2) == l)
            cost_h.append(
                jnp.where(hit, jax.lax.bitcast_convert_type(
                    sel(4), jnp.float32), NEG32)
            )
            cost_l.append(
                jnp.where(hit, jax.lax.bitcast_convert_type(
                    sel(5), jnp.float32), jnp.float32(0))
            )
            pids.append(jnp.where(hit, sel(3), -1))
        ch = jnp.stack(cost_h, axis=-1)  # [ru, uc, K]
        cl = jnp.stack(cost_l, axis=-1)
        pid = jnp.stack(pids, axis=-1)
        K = max_len

        lidx = jax.lax.broadcasted_iota(jnp.int32, ch.shape, 2) + 1
        has_single = jnp.any(
            (lidx == nclen[..., None]) & (ch > NEG32 / 2), axis=-1
        )
        unk_here = s_ok & ~has_single
        unk_sel = unk_here[..., None] & (lidx == nclen[..., None])
        ch = jnp.where(unk_sel, jnp.asarray(unk_hi, jnp.float32), ch)
        cl = jnp.where(unk_sel, jnp.asarray(unk_lo, jnp.float32), cl)
        pid = jnp.where(unk_sel, unk_id, pid)

        # ---- forward DP over columns (compensated f32 + near-tie flag) --
        ch_t = jnp.transpose(ch, (1, 0, 2))  # [uc, ru, K]
        cl_t = jnp.transpose(cl, (1, 0, 2))
        pid_t = jnp.transpose(pid, (1, 0, 2))
        bnd_t = jnp.transpose(uhead, (1, 0))
        pos_t = jax.lax.broadcasted_iota(jnp.int32, (uc, ru), 0)

        def step(carry, x):
            ph, plo, pst, pidc = carry  # [ru, K]
            ch_row, cl_row, pid_row, bnd_row, q_row = x
            node = (ph[:, 0], plo[:, 0], pst[:, 0], pidc[:, 0])
            dp_h = jnp.where(bnd_row, jnp.float32(0), ph[:, 0])
            dp_l = jnp.where(bnd_row, jnp.float32(0), plo[:, 0])
            sh_h = jnp.concatenate(
                [ph[:, 1:], jnp.full((ru, 1), NEG32)], axis=1
            )
            sh_l = jnp.concatenate(
                [plo[:, 1:], jnp.zeros((ru, 1), jnp.float32)], axis=1
            )
            sh_st = jnp.concatenate(
                [pst[:, 1:], jnp.full((ru, 1), -1, jnp.int32)], axis=1
            )
            sh_id = jnp.concatenate(
                [pidc[:, 1:], jnp.full((ru, 1), -1, jnp.int32)], axis=1
            )
            cand_h, cand_l = dd_add(
                dp_h[:, None], dp_l[:, None], ch_row, cl_row
            )
            ok = (ch_row > NEG32 / 2) & (dp_h > NEG32 / 2)[:, None]
            both = ok & (sh_h > NEG32 / 2)
            eps = (
                (q_row[:, None].astype(jnp.float32) + 2.0)
                * TIE_EPS_REL
                * (jnp.abs(cand_h) + jnp.abs(sh_h) + 1.0)
            )
            near = both & (
                jnp.abs((cand_h - sh_h) + (cand_l - sh_l)) <= eps
            )
            better = ok & dd_gt(cand_h, cand_l, sh_h, sh_l)
            new_h = jnp.where(better, cand_h, sh_h)
            new_l = jnp.where(better, cand_l, sh_l)
            new_st = jnp.where(better, q_row[:, None], sh_st)
            new_id = jnp.where(better, pid_row, sh_id)
            return (new_h, new_l, new_st, new_id), (
                node[2], node[3], jnp.any(near, axis=1)
            )

        init = (
            jnp.full((ru, K), NEG32),
            jnp.zeros((ru, K), jnp.float32),
            jnp.full((ru, K), -1, jnp.int32),
            jnp.full((ru, K), -1, jnp.int32),
        )
        (fh, fl, fst, fid), (o_st, o_id, o_near) = jax.lax.scan(
            step, init, (ch_t, cl_t, pid_t, bnd_t, pos_t)
        )
        node_st = jnp.concatenate(
            [jnp.transpose(o_st, (1, 0)), fst[:, :1]], axis=1
        )  # [ru, uc + 1]
        node_id = jnp.concatenate(
            [jnp.transpose(o_id, (1, 0)), fid[:, :1]], axis=1
        )
        near_f = jnp.transpose(o_near, (1, 0)) & inb_u  # [ru, uc]

        # ---- backtrack: one reverse scan with a K-boundary window --------
        bpos = jax.lax.broadcasted_iota(jnp.int32, (ru, uc + 1), 1)
        jlen = jnp.where(node_st >= 0, bpos - node_st, 0)
        is_wlast = inb_u & (npos == wend_col)
        seed = _shift_prev(
            jnp.concatenate(
                [is_wlast, jnp.zeros((ru, 1), bool)], axis=1
            ).astype(jnp.int32),
            0, 1,
        ) == 1

        seed_t = jnp.transpose(seed, (1, 0))
        jlen_t = jnp.transpose(jlen, (1, 0))

        def bt_step(pend, x):
            seed_q, jlen_q = x
            reach_q = seed_q | (pend[:, 0] > 0)
            sl = jax.lax.broadcasted_iota(jnp.int32, (ru, K + 1), 1)
            mark = (sl == jlen_q[:, None]) & reach_q[:, None]
            pend = pend | mark.astype(jnp.int32)
            pend = jnp.concatenate(
                [pend[:, 1:], jnp.zeros((ru, 1), jnp.int32)], axis=1
            )
            return pend, reach_q

        _, reach_t = jax.lax.scan(
            bt_step,
            jnp.zeros((ru, K + 1), jnp.int32),
            (seed_t, jlen_t),
            reverse=True,
        )
        reach = jnp.transpose(reach_t, (1, 0))
        tok = reach & (node_st >= 0) & (jlen > 0)

        # ---- fuse_unk (same rule as the dense/packed programs) -----------
        hsrc = jnp.where(uhead, npos, jnp.where(inb_u, -3, -1))

        def op_head(a, c):
            (v1,), (v2,) = a, c
            return (jnp.where(v2 == -3, v1, v2),)

        (headb,) = jax.lax.associative_scan(op_head, (hsrc,), axis=1)
        head_of = jnp.concatenate(
            [jnp.full((ru, 1), -1, jnp.int32), headb], axis=1
        )
        prev_id = jnp.zeros((ru, uc + 1), jnp.int32) - 1
        prev_is_tok = jnp.zeros((ru, uc + 1), bool)
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

        # ---- tokens at their START byte positions ------------------------
        if bf_tab is not None:
            from .unigram_encode import byte_fallback_expand

            ids, _st, _en, _emit_b = byte_fallback_expand(
                emit, jlen, node_id, unk_id, bf_tab, b_u, inb_u, K
            )
            return ids, wid_u, near_f
        ids = jnp.full((ru, uc + 1), -1, jnp.int32)
        for d in range(1, K + 1):
            m = _shift_next(
                (emit & (jlen == d)).astype(jnp.int32), 0, d
            ) == 1
            ids = jnp.where(m, _shift_next(node_id, -1, d), ids)
        ids = ids[:, :uc]

        return ids, wid_u, near_f

    return encode


# ---------------------------------------------------------------------------
# the full program: normalize + dedup + Viterbi + expand (+ cache, + scan)
# ---------------------------------------------------------------------------


def _unigram_dedup_core(
    bytes_u8,
    lengths,
    cls_s1,
    cls_s2,
    vrows0,
    vrows1,
    vseed,
    pow1,
    pow2,
    unk_id,
    unk_hi,
    unk_lo,
    max_len,
    bf_tab=None,
    word_cache=False,
    cache_rows=None,
    cache_buf=None,
    cache_p=None,
):
    """-> (ids [B, out_w], ntok [B], row_bad [B]) (+ cache state)."""
    B, L = bytes_u8.shape
    L2 = L * 2 + 4
    nb, wbnd, ninb, total, row_bad, _src = normalize_metaspace(
        bytes_u8, lengths, cls_s1, cls_s2, False
    )
    npos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)

    BIGP = jnp.int32(0x7FFFFFFF)
    nxt_b = jax.lax.cummin(jnp.where(wbnd, npos, BIGP), axis=1, reverse=True)
    nxt_bnd = jnp.minimum(_shift_next(nxt_b, BIGP), total[:, None])
    # Words longer than the packing slack can't enter the unique buffer
    # (the reverse-scan backtrack itself has no per-word token cap) —
    # dedup_layout excludes them via max_wlen and they surface as patch
    # records (host re-encodes just those words), NOT whole bad rows
    # (r4's row_long flagged 1.8% of bench rows for 0.0014% of words).

    geom = unigram_geometry(B * L2)
    out_w = max(L // 2, 64)
    if word_cache:
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
        nb,
        wbnd,
        ninb,
        total,
        nxt_bnd,
        jnp.int32(vseed),
        geom,
        cache=cache,
        max_wlen=UD_SLACK,
    )
    encode = unigram_unique_encoder(
        vrows0, vrows1, vseed, pow1, pow2, unk_id, unk_hi, unk_lo, max_len,
        bf_tab=bf_tab,
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
            max_wlen=UD_SLACK,
            patch_cap=PATCH_CAP,
        )
        return r if word_cache else (r, ())

    def branch_slow(dops):
        ids = jnp.full((B, out_w), -1, jnp.int32)
        ntok = jnp.zeros((B,), jnp.int32)
        bad = jnp.ones((B,), bool)
        ptab = jnp.zeros((PATCH_CAP, 5), jnp.int32)
        return (
            (ids, ntok, bad, ptab, jnp.int32(0)),
            (cstate if word_cache else ()),
        )

    (ids, ntok, bad, ptab, nflag), st = jax.lax.cond(
        fits, branch_fast, branch_slow, dops
    )
    bad = bad | row_bad
    if word_cache:
        return ids, ntok, bad, ptab, nflag, st
    return ids, ntok, bad, ptab, nflag


unigram_dedup_program = functools.partial(
    jax.jit,
    static_argnames=("max_len", "word_cache"),
    donate_argnames=("cache_rows", "cache_buf", "cache_p"),
)(_unigram_dedup_core)


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "word_cache"),
    donate_argnames=("cache_rows", "cache_buf", "cache_p"),
)
def unigram_dedup_scan(
    bytes_u8,  # uint8[N, B, L]
    lengths,  # int32[N, B]
    cls_s1,
    cls_s2,
    vrows0,
    vrows1,
    vseed,
    pow1,
    pow2,
    unk_id,
    unk_hi,
    unk_lo,
    max_len,
    bf_tab=None,
    word_cache=True,
    cache_rows=None,
    cache_buf=None,
    cache_p=None,
):
    """N same-shape chunks in one dispatch, word cache as scan carry.

    Returns (ids [N,B,out_w], ntok [N,B], bad [N,B],
    patch_tab [N,PATCH_CAP,5], n_patch [N], cache_carry)."""

    def step(carry, xs):
        buf, lens = xs
        if word_cache:
            crows, cbuf, p = carry
            ids, ntok, bad, ptab, nflag, st = _unigram_dedup_core(
                buf, lens, cls_s1, cls_s2, vrows0, vrows1, vseed,
                pow1, pow2, unk_id, unk_hi, unk_lo, max_len,
                bf_tab=bf_tab, word_cache=True, cache_rows=crows,
                cache_buf=cbuf, cache_p=p,
            )
            return tuple(st), (ids, ntok, bad, ptab, nflag)
        ids, ntok, bad, ptab, nflag = _unigram_dedup_core(
            buf, lens, cls_s1, cls_s2, vrows0, vrows1, vseed,
            pow1, pow2, unk_id, unk_hi, unk_lo, max_len, bf_tab=bf_tab,
        )
        return carry, (ids, ntok, bad, ptab, nflag)

    init = (cache_rows, cache_buf, cache_p) if word_cache else ()
    carry, (ids, ntok, bad, ptab, nflag) = jax.lax.scan(
        step, init, (bytes_u8, lengths)
    )
    return ids, ntok, bad, ptab, nflag, carry
