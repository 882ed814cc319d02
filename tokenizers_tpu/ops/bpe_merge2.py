"""Gather-minimal BPE merge rounds (the encode hot loop, v2).

XLA:TPU lowers general gathers (`take_along_axis`, table lookups) far slower
than elementwise/shift ops, so this version eliminates the linked-list
pointer chasing of the naive formulation:

  * adjacency is recovered each round with logarithmic *shift-fills*
    (select + static shifts — no gathers): the id/word of the next alive
    position, and the merge flag of the previous alive position;
  * the merge-rank lookup packs each cuckoo table as rows `[S, 4] =
    (key_a, key_b, rank, new_id)`, so one lookup costs two row-gathers
    instead of eight scalar gathers;
  * overlap parity within equal-pair chains is a segmented *sum* scan
    ((int, reset-flag) monoid) instead of a function-composition scan;
  * after a few rounds most tokens are dead, so the batch is *compacted*
    to half width (one scatter) and later rounds run on the smaller tensor.

Words longer than WORD_CAP bytes would break the bounded fill depth; the
boundary stage flags rows containing them (row_bad) for host fallback, as
does compaction overflow (e.g. unmergeable binary input).

Semantics are identical to the v1 linked-list loop: each round merges every
occurrence of each word's minimum-rank pair, leftmost-first within
overlapping runs — bit-equivalent to the reference's (rank, pos) heap order
for well-formed tables (see bpe_encode.py module docstring).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .merge_table import hash_jnp

INF = np.int32(0x7FFFFFFF)
WORD_CAP = 512  # max word length in bytes; K = 9 fill steps
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


def merge_round(ids, wid, seg, rows0, rows1, seed):
    """One merge round on (ids, wid); ids -1 = dead. Returns (ids, any_f)."""
    alive = ids >= 0
    (nid, nwid), nfnd = fill_next([ids, wid], alive)
    valid = alive & nfnd & (nwid == wid)

    mask = rows0.shape[0] - 1
    h0 = hash_jnp(ids, nid, seed, mask, 0)
    h1 = hash_jnp(ids, nid, seed, mask, 1)
    r0 = rows0[h0]
    r1 = rows1[h1]
    hit0 = (r0[..., 0] == ids) & (r0[..., 1] == nid)
    hit1 = (r1[..., 0] == ids) & (r1[..., 1] == nid)
    r = jnp.where(hit0, r0[..., 2], jnp.where(hit1, r1[..., 2], INF))
    r = jnp.where(valid, r, INF)
    new_id = jnp.where(hit0, r0[..., 3], r1[..., 3])

    wmin = _seg_min(r, seg)
    f = valid & (r < INF) & (r == wmin)
    cnt = _seg_count(f, alive & ~f)
    merge = f & (cnt % 2 == 1)

    (pm,), pfnd = fill_prev([merge.astype(jnp.int32)], alive)
    kill = alive & pfnd & (pm == 1)
    ids = jnp.where(merge, new_id, ids)
    ids = jnp.where(kill, -1, ids)
    return ids, jnp.any(f)


def compact(ids, wid, w_new):
    """Left-pack alive tokens into width w_new; overflow rows flagged."""
    B, W = ids.shape
    alive = ids >= 0
    k = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
    ntok = jnp.sum(alive.astype(jnp.int32), axis=1)
    bad = ntok > w_new
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, W), 0)
    tgt = jnp.where(alive, jnp.minimum(k, w_new), w_new)
    out_ids = jnp.full((B, w_new + 1), -1, jnp.int32).at[rows, tgt].set(
        jnp.where(alive, ids, -1)
    )
    out_wid = jnp.full((B, w_new + 1), -1, jnp.int32).at[rows, tgt].set(
        jnp.where(alive, wid, -1)
    )
    return out_ids[:, :w_new], out_wid[:, :w_new], bad


def run_merge_phases(ids, wid, rows0, rows1, seed, phase1_rounds=6, phase2_rounds=6):
    """Full merge: fixed rounds at full width, compact to half, fixed rounds,
    then loop to completion at half width. Returns (ids, wid, row_bad)."""
    B, W = ids.shape

    def seg_of(wid):
        return wid != _shift_prev(wid, -2)

    seg = seg_of(wid)

    def body_fixed(_, state):
        ids, any_f = state
        ids, af = merge_round(ids, wid, seg, rows0, rows1, seed)
        return ids, af

    ids, _ = jax.lax.fori_loop(
        0, phase1_rounds, body_fixed, (ids, jnp.array(True))
    )

    w2 = max(W // 2, 64)
    ids, wid2, bad = compact(ids, wid, w2)
    seg2 = seg_of(wid2)

    def body2(_, state):
        ids, any_f = state
        ids, af = merge_round(ids, wid2, seg2, rows0, rows1, seed)
        return ids, af

    ids, _ = jax.lax.fori_loop(
        0, phase2_rounds, body2, (ids, jnp.array(True))
    )

    def cond(state):
        return state[1]

    def body3(state):
        ids, _ = state
        ids, af = merge_round(ids, wid2, seg2, rows0, rows1, seed)
        return ids, af

    ids, _ = jax.lax.while_loop(cond, body3, (ids, jnp.array(True)))
    return ids, wid2, bad
