"""Gather-minimal BPE merge rounds (the encode hot loop).

XLA:TPU lowers general gathers (`take_along_axis`, table lookups) at a cost
per *index*, hundreds of times an elementwise op, so the loop is built to
touch as few gathered elements as possible:

  * adjacency is recovered each round with logarithmic *shift-fills*
    (select + static shifts — no gathers); after r rounds since the last
    compaction the longest dead gap is < 2^r, so early rounds use shallow
    fills;
  * the merge-rank lookup packs each cuckoo table as [S, 4] rows, so one
    lookup costs two row-gathers (a cached-rank delta-refresh variant was
    measured slower on this backend and removed);
  * overlap parity within equal-pair chains is a segmented *sum* scan;
  * the batch is compacted to half width once most tokens are dead, so late
    rounds run on the smaller tensor.

Words longer than WORD_CAP bytes would break the bounded fill depth; the
boundary stage flags rows containing them (row_bad) for host fallback, as
does compaction overflow (e.g. unmergeable binary input).

Semantics are identical to the linked-list formulation: each round merges
every occurrence of each word's minimum-rank pair, leftmost-first within
overlapping runs — bit-equivalent to the reference's (rank, pos) heap order
for well-formed tables (see bpe_encode.py module docstring).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .merge_table import hash_jnp

INF = np.int32(0x7FFFFFFF)
WORD_CAP = 512  # max word length in bytes; FILL_K = 9 covers its gaps
FILL_K = 9


def _shift_next(x, fill, k=1):
    if k >= x.shape[1]:
        return jnp.full(x.shape, fill, x.dtype)
    return jnp.concatenate(
        [x[:, k:], jnp.full((x.shape[0], k), fill, x.dtype)], axis=1
    )


def _shift_prev(x, fill, k=1):
    if k >= x.shape[1]:
        return jnp.full(x.shape, fill, x.dtype)
    return jnp.concatenate(
        [jnp.full((x.shape[0], k), fill, x.dtype), x[:, :-k]], axis=1
    )


def fill_next(vals, alive, k_steps=FILL_K):
    """Per position: values at the first alive position strictly after it
    (within 2^k_steps). Returns (filled_vals, found_mask)."""
    fnd = _shift_next(alive, False)
    zs = [_shift_next(jnp.where(alive, v, 0), 0) for v in vals]
    s = 1
    for _ in range(k_steps):
        fnd_s = _shift_next(fnd, False, s)
        zs = [jnp.where(fnd, z, _shift_next(z, 0, s)) for z in zs]
        fnd = fnd | fnd_s
        s *= 2
    return zs, fnd


def fill_prev(vals, alive, k_steps=FILL_K):
    """Per position: values at the last alive position strictly before it."""
    fnd = _shift_prev(alive, False)
    zs = [_shift_prev(jnp.where(alive, v, 0), 0) for v in vals]
    s = 1
    for _ in range(k_steps):
        fnd_s = _shift_prev(fnd, False, s)
        zs = [jnp.where(fnd, z, _shift_prev(z, 0, s)) for z in zs]
        fnd = fnd | fnd_s
        s *= 2
    return zs, fnd


def _seg_min(r, seg_start):
    def op(a, b):
        (v1, f1), (v2, f2) = a, b
        return jnp.where(f2, v2, jnp.minimum(v1, v2)), f1 | f2

    fwd, _ = jax.lax.associative_scan(op, (r, seg_start), axis=1)
    seg_end = _shift_next(seg_start, True)
    bwd, _ = jax.lax.associative_scan(op, (r, seg_end), axis=1, reverse=True)
    return jnp.minimum(fwd, bwd)


def _seg_count(add, reset):
    """Inclusive segmented sum of `add`, restarting at `reset` positions."""

    def op(a, b):
        (v1, f1), (v2, f2) = a, b
        return jnp.where(f2, v2, v1 + v2), f1 | f2

    out, _ = jax.lax.associative_scan(
        op, (add.astype(jnp.int32), reset), axis=1
    )
    return out


def lookup_pairs(a, b, rows0, rows1, seed):
    """(rank, new_id) for pair arrays of any shape; rank INF on miss."""
    mask = rows0.shape[0] - 1
    h0 = hash_jnp(a, b, seed, mask, 0)
    h1 = hash_jnp(a, b, seed, mask, 1)
    r0 = rows0[h0]
    r1 = rows1[h1]
    hit0 = (r0[..., 0] == a) & (r0[..., 1] == b)
    hit1 = (r1[..., 0] == a) & (r1[..., 1] == b)
    r = jnp.where(hit0, r0[..., 2], jnp.where(hit1, r1[..., 2], INF))
    nw = jnp.where(hit0, r0[..., 3], r1[..., 3])
    return r, nw


def lookup_pairs8(a, b, rows0, rows1, seed):
    """(rank, new_id, MCL(new_id), MCR(new_id)) from width-8 rows
    (`merge_table.rows8`); rank INF on miss."""
    mask = rows0.shape[0] - 1
    h0 = hash_jnp(a, b, seed, mask, 0)
    h1 = hash_jnp(a, b, seed, mask, 1)
    r0 = rows0[h0]
    r1 = rows1[h1]
    hit0 = (r0[..., 0] == a) & (r0[..., 1] == b)
    hit1 = (r1[..., 0] == a) & (r1[..., 1] == b)
    sel = lambda k: jnp.where(hit0, r0[..., k], r1[..., k])  # noqa: E731
    r = jnp.where(hit0 | hit1, sel(2), INF)
    return r, sel(3), sel(4), sel(5)


def _fill_last_vals(vals, isset, reverse=False):
    """Per position (per row): the values at the last position at-or-before
    it where `isset` (at-or-after when reverse; undefined where no such
    position exists)."""

    def op(a, b):
        s2 = b[-1]
        return tuple(
            jnp.where(s2, vb, va) for va, vb in zip(a[:-1], b[:-1])
        ) + (a[-1] | s2,)

    args = tuple(jnp.where(isset, v, 0) for v in vals) + (isset,)
    out = jax.lax.associative_scan(op, args, axis=1, reverse=reverse)
    return out[:-1]


def merge_round(ids, own_l, own_r, wid, seg, rows0, rows1, seed,
                k_steps=FILL_K):
    """One merge round on (ids, wid); ids -1 = dead.
    Returns (ids, own_l, own_r, f) — f is the bool merged-head mask (the
    tail ladder in `run_merge_phases` uses it to find still-active words;
    `jnp.any(f)` is the old any-merges scalar).

    `own_l`/`own_r` carry each position's token (MCL, MCR) — initialized
    once by the caller (`init_own`) and updated here from the width-8
    lookup row (`merge_table.rows8`), so no per-round `mclr[ids]` gather
    is needed.

    Merges the full *safe set* of pairs, not just each word's minimum-rank
    pair.  A candidate pair p = (L, R) with rank r, neighbor tokens P (left)
    and N (right) can only be destroyed before its turn by a merge that
    consumes L or R:

      * the direct neighbor pair (P, L) at its current rank r_prev, or
        (R, N) at r_next;
      * a merge (X, L) where X was assembled over P — by the well-formed-
        table property (every merge consuming a token ranks strictly above
        the merge that produced it; the original min-rank rule relies on
        the same property), its rank is > the rank of the first merge
        consuming P, hence >= MCL(P) + 1 where MCL(t) = min rank over
        table merges (., t);
      * symmetrically, a merge (R, Y) with Y assembled over N has rank
        >= MCR(N) + 1, MCR(t) = min rank over merges (t, .).

    With the reference's (rank, pos) order — lower rank first, leftmost
    wins ties — p is inevitable iff r < r_prev, r <= MCL(P), r < r_next and
    r <= MCR(N) + 1.  Equal ranks occur only for the *same* pair (ranks are
    unique per table), i.e. runs of consecutive identical pairs: a run
    merges at odd ordinals (leftmost-first parity), gated by its head's
    left-safety and its tail's right-safety, so a threatened boundary
    blocks the whole run (sequential would re-seat the parity).  Each
    word's minimum-rank pair is merged as well (it is trivially safe
    against the *word's* future, though table-global MCL/MCR may not know
    it), so every round makes progress.  The merged set is bit-identical
    to the reference's sequential heap order, in far fewer rounds.

    (A cached-rank delta-refresh variant was tried and measured *slower* on
    this backend — the extra loop state and lax.cond overhead exceeded the
    saved gather elements — so every round does the full lookup.)"""
    BIG = np.int32(0x3FFFFFF0)
    alive = ids >= 0
    mcl_own = jnp.where(alive, own_l, INF)
    mcr_own = jnp.where(alive, own_r, INF)

    (nid, nwid, nmcr), nfnd = fill_next([ids, wid, mcr_own], alive, k_steps)
    valid = alive & nfnd & (nwid == wid)

    r, new_id, mcl_new, mcr_new = lookup_pairs8(ids, nid, rows0, rows1, seed)
    r = jnp.where(valid, r, INF)
    cand = valid & (r < INF)

    # next pair's (rank, validity, MCR(N)) seen from each pair position
    (nr, nvalid, nnmcr), _ = fill_next(
        [r, valid.astype(jnp.int32), nmcr], alive, k_steps
    )
    # prev pair's rank / word / MCL(P)
    (pr, pw, pmcl), pfound = fill_prev([r, wid, mcl_own], alive, k_steps)
    prev_in_word = pfound & (pw == wid)

    # equal-rank run structure (ranks unique => equal rank == same pair)
    same_run_prev = cand & prev_in_word & (pr == r)
    run_start = cand & ~same_run_prev
    has_next_pair = valid & nfnd & (nvalid == 1)
    same_run_next = cand & has_next_pair & (nr == r)
    tail = cand & ~same_run_next

    head_ok = run_start & (
        ~prev_in_word | ((r < pr) & (r <= pmcl))
    )
    tail_ok = tail & (r < nr) & (
        ~has_next_pair | (r <= jnp.minimum(nnmcr, BIG) + 1)
    )

    # broadcast head/tail safety over each run; run-local parity
    q = _seg_count(cand, seg)
    hl, q_head = _fill_last_vals([head_ok.astype(jnp.int32), q], run_start)
    (tl,) = _fill_last_vals([tail_ok.astype(jnp.int32)], tail, reverse=True)
    parity_odd = (q - q_head) % 2 == 0

    wmin = _seg_min(r, seg)
    f = cand & parity_odd & ((r == wmin) | ((hl == 1) & (tl == 1)))

    (pm,), pfnd = fill_prev([f.astype(jnp.int32)], alive, k_steps)
    kill = alive & pfnd & (pm == 1)
    ids = jnp.where(f, new_id, ids)
    ids = jnp.where(kill, -1, ids)
    own_l = jnp.where(f, mcl_new, own_l)
    own_r = jnp.where(f, mcr_new, own_r)
    return ids, own_l, own_r, f


def init_own(ids, mclr):
    """Initial per-position (MCL, MCR) carried state for `merge_round`:
    one row gather (the only mclr gather in the whole merge).  The [V, 2]
    table is padded to width 4 first — narrow row gathers miss the
    aligned fast path on this backend (r5)."""
    V = mclr.shape[0]
    if mclr.shape[-1] < 4:
        mclr = jnp.concatenate(
            [mclr, jnp.zeros((V, 4 - mclr.shape[-1]), mclr.dtype)], axis=-1
        )
    own = mclr[jnp.clip(ids, 0, V - 1)]
    return own[..., 0], own[..., 1]


def _round(ids, own_l, own_r, wid, seg, rows0, rows1, seed, k_steps=FILL_K):
    """One merge round: the Pallas-fused kernels on a real TPU backend,
    the lax formulation (the oracle) elsewhere.  Bit-identical paths —
    fuzzed against each other in tests/test_merge_pallas.py.

    Standalone form (recomputes pair keys every round); the loops use
    `make_round_driver`, which carries the keys between rounds on the
    Pallas path."""
    from .merge_pallas import merge_round_pallas, supported, use_pallas

    if use_pallas() and supported(ids.shape):
        return merge_round_pallas(
            ids, own_l, own_r, wid, rows0, rows1, seed, k_steps=FILL_K
        )
    return merge_round(
        ids, own_l, own_r, wid, seg, rows0, rows1, seed, k_steps=k_steps
    )


def make_round_driver(wid, seg, rows0, rows1, seed, k_steps=FILL_K):
    """(init, step, unpack) for running merge rounds in a loop.

    On the Pallas path the round state carries the NEXT round's pair keys
    (h0, h1, next-id), produced by the fused apply+keys kernel
    (`merge_round_fused`) — one kernel launch and one HBM state
    round-trip per round instead of two (r5: the merge phases measured
    27.2 of the 66.8 ms/chunk real-program budget, ~0.4ms/round of which
    was the separate keys kernel).  State rows are padded to the RB
    multiple ONCE at init and stay padded through the loop.

    The lax path (CPU oracle) keeps the self-contained round; both paths
    return `f` (merged-head mask) at the caller's row count.

    `wid`/`seg` are captured at the CALLER's (unpadded) shape; padded
    rows carry wid=-1/all-dead and can never merge."""
    from .merge_pallas import (
        _pad_rb,
        keys_pallas,
        merge_round_fused,
        supported,
        use_pallas,
    )

    R0 = wid.shape[0]
    if use_pallas() and supported(wid.shape):
        wid_p = _pad_rb(wid, -1)

        def init(ids, own_l, own_r):
            ids = _pad_rb(ids, -1)
            own_l = _pad_rb(own_l, 0)
            own_r = _pad_rb(own_r, 0)
            h0, h1, nid = keys_pallas(ids, rows0, seed, k_steps=FILL_K)
            return (ids, own_l, own_r, h0, h1, nid)

        def step(st):
            ids, ol, orr, h0, h1, nid = st
            ids2, ol2, orr2, f, h0n, h1n, nidn = merge_round_fused(
                ids, ol, orr, wid_p, h0, h1, nid, rows0, rows1, seed,
                k_steps=FILL_K,
            )
            return (ids2, ol2, orr2, h0n, h1n, nidn), f[:R0]

        def unpack(st):
            return st[0][:R0], st[1][:R0], st[2][:R0]

    else:

        def init(ids, own_l, own_r):
            return (ids, own_l, own_r)

        def step(st):
            ids2, ol2, orr2, f = merge_round(
                st[0], st[1], st[2], wid, seg, rows0, rows1, seed,
                k_steps=k_steps,
            )
            return (ids2, ol2, orr2), f

        def unpack(st):
            return st

    return init, step, unpack


def compact(ids, wid, w_new, extras=()):
    """Left-pack alive tokens into width w_new; overflow rows flagged.

    Butterfly compaction (`route.compact_left`) — log-depth elementwise
    selects, no per-index scatter cost (scatters on this backend cost per
    index; see route.py).

    `extras`: additional int32 arrays to compact alongside (e.g. original
    byte positions for offset tracking)."""
    from .route import compact_left

    B, W = ids.shape
    alive = ids >= 0
    vals = (ids, wid) + tuple(extras)
    fills = (-1,) * len(vals)
    out, ntok = compact_left(vals, alive, fills)
    bad = ntok > w_new
    out = tuple(v[:, :w_new] for v in out)
    return out[0], out[1], bad, out[2:]


def _seg_of(wid):
    return wid != _shift_prev(wid, -2)


def _seg_count_rev(add, reset_end):
    """Reverse inclusive segmented sum (reset at segment-END flags)."""

    def op(a, b):
        (v1, f1), (v2, f2) = a, b
        return jnp.where(f2, v2, v1 + v2), f1 | f2

    out, _ = jax.lax.associative_scan(
        op, (add.astype(jnp.int32), reset_end), axis=1, reverse=True
    )
    return out


def _word_any(f, seg):
    """Per position: whether any position of its word has `f` set."""
    fi = f.astype(jnp.int32)
    fwd = _seg_count(fi > 0, seg)
    seg_end = _shift_next(seg, True)
    bwd = _seg_count_rev(fi, seg_end)
    return (fwd + bwd - fi) > 0


def _g_excl_cumsum(x):
    """Row-major global exclusive cumsum of a 2D int32 array."""
    r = jnp.cumsum(x, axis=1)
    tot = r[:, -1]
    roff = jnp.cumsum(tot) - tot
    return r - x + roff[:, None]


def _tail_ladder(ids, own_l, own_r, f, wid3, seg3, rows0, rows1, seed,
                 obp=None, depth=2):
    """Data-dependent merge tail, on a buffer sized to the ACTIVE words.

    After the 12 scheduled rounds, almost every word is finished: measured
    on the bench corpus, active tokens (tokens of words that still merged
    last round) are ~1% of the buffer, and the last ~15 rounds chase a
    single long word — yet the plain while-loop ran every round over the
    whole W/2 buffer (round cost ≈ fixed + ~7-10 ns/element; PERF.md).

    A word with no merge in a round is finished FOREVER: the safe-set round
    always merges each word's minimum-rank remaining pair (`merge_round`),
    so no merge ⇔ no candidate pairs left.  So:

      1. loop at w3 while merges continue AND the active tokens exceed the
         small-buffer capacity (usually zero extra rounds);
      2. butterfly-compact the active words' alive tokens into a buffer
         1/16 the rows (words placed with WORD_CAP row-slack so none
         crosses a row — same trick as the dedup unique buffer);
      3. loop there until no merges;
      4. invalidate the active words' stale tokens in the w3 buffer and
         butterfly-route the finished tokens back to their home positions
         (monotone: compaction and in-place merges both preserve order).

    Returns (ids, obp') at w3 shapes.  `obp` (original byte positions for
    the offsets path) rides the compaction and the route back.

    `depth` rungs recurse: each compacts the still-active words into a
    buffer with 1/8 the rows and continues there, so round cost tracks the
    geometric decay of active tokens (measured ~0.55x/round) instead of
    staying at the scheduled width.  depth=0 is the plain while tail —
    used by the rare overflow branches to keep their compiled size down."""
    return _ladder_rung(
        ids, own_l, own_r, f, wid3, seg3, rows0, rows1, seed, obp=obp,
        depth=depth,
    )


def _ladder_rung(ids, own_l, own_r, f, wid3, seg3, rows0, rows1, seed,
                 obp=None, depth=0, ratio=2):
    """`ratio`: row shrink factor of this rung's buffer.  The FIRST rung
    uses 2 (r5): a round's cost is ~11ns/lane (merge-table gathers over
    all lanes, dead included), so hopping active words out of the wide
    buffer as soon as they fit a half-size rung beats holding extra
    full-width rounds waiting for the old 1/8 rung to fit; recursion
    shrinks by 8 from there."""
    B3, C3 = ids.shape
    R4 = max(B3 // ratio, 2)
    C4 = C3
    slack = min(WORD_CAP, C4 // 2)
    C4eff = C4 - slack
    CAP4 = R4 * C4eff
    last = depth == 0 or R4 >= B3

    def act_stats(ids_, f_):
        alive_ = ids_ >= 0
        act = alive_ & _word_any(f_ & alive_, seg3)
        return act, jnp.sum(act.astype(jnp.int32))

    init, step, unpack = make_round_driver(wid3, seg3, rows0, rows1, seed)

    if last:
        # bottom rung: plain rounds until dry
        def cond(c):
            return c[1]

        def body(c):
            st, _any = c
            st2, f2 = step(st)
            return (st2, jnp.any(f2))

        stF, _ = jax.lax.while_loop(
            cond, body, (init(ids, own_l, own_r), jnp.any(f))
        )
        ids, own_l, own_r = unpack(stF)
        return ids, obp

    # rounds at this width while the active set is too big for the next rung
    def cond3(c):
        return jnp.any(c[1]) & (c[2] > CAP4)

    def body3(c):
        st, _f, _n = c
        st2, f2 = step(st)
        _a, n2 = act_stats(st2[0][: wid3.shape[0]], f2)
        return (st2, f2, n2)

    _a0, n0 = act_stats(ids, f)
    stF, f, _n = jax.lax.while_loop(
        cond3, body3, (init(ids, own_l, own_r), f, n0)
    )
    ids, own_l, own_r = unpack(stF)
    act, _n = act_stats(ids, f)

    # ---- compact active words' alive tokens to [R4, C4] ----------------
    from .route import route_to

    rowi = jax.lax.broadcasted_iota(jnp.int32, (B3, C3), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (B3, C3), 1)
    # global word ordinal: wid3 may be per-row (full-width paths), so words
    # from different rows that become adjacent after compaction must still
    # compare unequal.  seg3 never fires inside a word (killed slots keep
    # their wid), so the running count of segment starts is constant on a
    # word and distinct between words (dead-fill runs burn an ordinal,
    # harmlessly).
    segi = seg3.astype(jnp.int32)
    gw = _g_excl_cumsum(segi) + segi - 1
    r_d = _g_excl_cumsum(act.astype(jnp.int32))  # dense rank among actives
    k_w = _seg_count(act, seg3) - 1  # within-word rank (at act positions)
    b_w = r_d - k_w  # word base = first active position's dense rank
    tgt = (b_w // C4eff) * C4 + (b_w % C4eff) + k_w
    home = rowi * C3 + coli
    vals = (ids, own_l, own_r, gw, home) + (
        (obp,) if obp is not None else ()
    )
    fills = (-1, 0, 0, -1, 0) + ((0,) if obp is not None else ())
    routed, live4 = route_to(
        vals, act, jnp.where(act, tgt, 0), fills, wrap=True, n_out=R4 * C4
    )
    ids4, ol4, orr4, gw4, home4 = routed[:5]
    obp4 = routed[5] if obp is not None else None
    ids4 = jnp.where(live4, ids4, -1)
    gw4 = jnp.where(live4, gw4, -1)
    seg4 = _seg_of(gw4)

    # ---- recurse: rounds at 1/8 of these rows (and below) until dry ----
    ids4, obp4 = _ladder_rung(
        ids4, ol4, orr4, live4, gw4, seg4, rows0, rows1, seed,
        obp=obp4, depth=depth - 1, ratio=8,
    )

    # ---- route finished tokens back to their home positions ------------
    alive4 = ids4 >= 0
    back_vals = (ids4,) + ((obp4,) if obp is not None else ())
    back_fills = (-1,) + ((0,) if obp is not None else ())
    backed, liveb = route_to(
        back_vals, alive4, jnp.where(alive4, home4, 0), back_fills,
        wrap=True, n_out=B3 * C3,
    )
    ids_b = backed[0].reshape(B3, C3)
    liveb = liveb.reshape(B3, C3)
    ids = jnp.where(liveb, ids_b, jnp.where(act, -1, ids))
    if obp is not None:
        obp_b = backed[1].reshape(B3, C3)
        obp = jnp.where(liveb, obp_b, obp)
    return ids, obp


def _rounds_loop(ids, own_l, own_r, wid, seg, rows0, rows1, seed, n_max,
                 k_steps=FILL_K):
    """Up to `n_max` merge rounds at this width, stopping early when a
    round makes no merges.  ONE loop body per width instead of `n_max`
    inlined round graphs — compile cost (trace time, XLA compile, and the
    serialized executable, all first-class costs of this architecture) is
    per-BODY, and the Pallas round uses the full fill depth regardless of
    round index so the bodies are identical anyway.

    Returns (ids, own_l, own_r, f) with `f` the last round's merged-head
    mask (all-True if the loop ran zero rounds, which only happens for
    n_max == 0)."""
    init, step, unpack = make_round_driver(
        wid, seg, rows0, rows1, seed, k_steps=k_steps
    )

    def cond(c):
        return c[1] & (c[2] < n_max)

    def body(c):
        st, _any, r, _f = c
        st2, f2 = step(st)
        return (st2, jnp.any(f2), r + 1, f2)

    c0 = (
        init(ids, own_l, own_r),
        jnp.bool_(True),
        jnp.int32(0),
        jnp.ones(wid.shape, bool),
    )
    stF, _any, _r, f = jax.lax.while_loop(cond, body, c0)
    ids, own_l, own_r = unpack(stF)
    return ids, own_l, own_r, f


def run_merge_phases(
    ids, wid, rows0, rows1, seed, mclr, phase1_rounds=4, obp=None, k_min=1,
    ladder_depth=2,
):
    """Full merge to completion: bounded rounds at input width, compact to
    3/4 then 1/2 width, then the data-dependent tail ladder.
    Returns (ids, wid, row_bad, obp').

    `rows0`/`rows1` are width-8 rows (`merge_table.rows8`); `mclr` is the
    [V, 2] consume-mins table used once to seed the carried per-position
    (MCL, MCR) state (`init_own`).

    `obp` (original byte position per token, for offsets) rides along:
    merges keep the left token's position, so it only changes at compaction.

    `k_min` is accepted for API compatibility with the char-level callers;
    rounds always run the full FILL_K fill depth (exact for every seeding —
    gaps inside words are bounded by WORD_CAP < 2^FILL_K), which is what
    lets each width's rounds share ONE while-loop body (r5: the unrolled
    growing-depth schedule put 8 inlined round graphs in every merge
    instance and the serialized bench executables hit 100-240MB).

    Width schedule (measured on the bench corpus: alive tokens decay
    1.0 -> .37 after 4 rounds -> .21 after 8 -> plateau .185 by ~15, and a
    round costs ~(fixed + per-element-touched)): bounded rounds at
    geometrically compacted widths do most of the work, and the tail
    ladder runs the data-dependent remainder on buffers sized to the
    still-active words.  Compaction overflow (pathological token density)
    flags row_bad -> host fallback, the same contract the single W/2
    compaction always had."""
    B, W = ids.shape
    del k_min  # rounds always use FILL_K (see docstring)

    own_l, own_r = init_own(ids, mclr)
    seg = _seg_of(wid)
    ids, own_l, own_r, f = _rounds_loop(
        ids, own_l, own_r, wid, seg, rows0, rows1, seed,
        min(phase1_rounds, 2),
    )

    def _round_width(frac_num, frac_den):
        # width schedule (r5 re-tuned from the REAL per-round cost model:
        # a round is dominated by the merge-table gathers over ALL lanes
        # incl. dead ones, so lane-count x rounds is the merge budget):
        # compact after TWO full-width rounds to 5/8 (prose alive after 2
        # rounds ~0.5; 5/8 leaves outlier-row margin), two more rounds,
        # then the long-lived 1/2-width buffer.  Code/symbol rows that
        # plateau above a width overflow their buffer row -> their input
        # rows host-fallback (the measured residue is ~0.2%); widths stay
        # generous for exactly that reason.  Keep Pallas alignment
        # (C % 128 == 0).
        w = (W * frac_num) // frac_den
        if w >= 256:
            w = -(-w // 128) * 128
        return max(w, 64)

    extras = (own_l, own_r) + ((obp,) if obp is not None else ())
    w2 = _round_width(5, 8)
    ids, wid2, bad, extras = compact(ids, wid, w2, extras)
    own_l, own_r = extras[0], extras[1]
    seg2 = _seg_of(wid2)
    ids, own_l, own_r, f = _rounds_loop(
        ids, own_l, own_r, wid2, seg2, rows0, rows1, seed, 2
    )

    w3 = _round_width(1, 2)
    extras = (own_l, own_r) + extras[2:]
    ids, wid3, bad3, extras = compact(ids, wid2, w3, extras)
    own_l, own_r = extras[0], extras[1]
    bad = bad | bad3
    seg3 = _seg_of(wid3)
    ids, own_l, own_r, f = _rounds_loop(
        ids, own_l, own_r, wid3, seg3, rows0, rows1, seed, 2
    )

    ids, obp2 = _tail_ladder(
        ids, own_l, own_r, f, wid3, seg3, rows0, rows1, seed,
        obp=extras[2] if obp is not None else None, depth=ladder_depth,
    )
    return ids, wid3, bad, obp2
