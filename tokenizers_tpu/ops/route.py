"""Monotone routing without gathers/scatters: butterfly shift networks.

XLA:TPU lowers dynamic gather/scatter at a per-index cost (~10ns/index
measured on this backend — see PERF.md), which makes every "pack the alive
elements left" / "spread records to increasing offsets" step cost as much
as the whole merge loop.  But almost all data movement in the encode
pipeline is *monotone* (stream compaction, expansion to packed offsets),
and those admit conflict-free butterfly decompositions of log2(max_shift)
rounds of elementwise selects — no per-index cost, bandwidth-bound (~10x
one scatter over the same elements on this backend).

Two safe primitives (fuzzed in `tests/test_route.py`):

  * `compact_left_flat`: left-pack live elements (stable).  Shift
    distances d_i = (#dead before i) are non-decreasing, and LSB-first
    leftward pulls never collide: a stage-b collision between elements
    i < j forces (writing d = hi*2^(b+1) + bit_b*2^b + lo)
    hi_j < hi_i, while d_j >= d_i forces hi_j >= hi_i.
  * `spread_right_flat`: move dense elements 0..n-1 to strictly
    increasing targets t_i (d_i = t_i - i is automatically
    non-decreasing).  This is the exact INVERSE network of a compaction
    with the same distances, so running the stages in reverse order
    (MSB-first, rightward) visits the compaction's intermediate
    configurations backwards — conflict-free because the forward run is.

Any monotone route (sources strictly increasing -> targets strictly
increasing, either direction, with gaps on both sides) is
`spread_right_flat . compact_left_flat` (`route_to_flat`).

NOT safe: a single-pass butterfly with non-monotone shift distances
(two elements can transiently land on one slot even when their final
targets differ) — that is why the general case composes the two legs.

Used for: merge-buffer compaction, word-record packing, unique-buffer
byte copies, and output offset spreading (bpe_dedup.py, bpe_merge2.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_next_flat(x, fill, k, wrap=False):
    """Row-major flat x[j+k] over a [R, C] array.

    With `wrap=False` rows are independent streams (vacated tail of each
    row <- fill).  With `wrap=True` the array is ONE row-major stream:
    elements cross row boundaries (j indexes the flattened array)."""
    R, C = x.shape
    if not wrap:
        if k >= C:
            return jnp.full(x.shape, fill, x.dtype)
        return jnp.concatenate(
            [x[:, k:], jnp.full((R, k), fill, x.dtype)], axis=1
        )
    r, c = divmod(k, C)
    if r >= R:
        return jnp.full(x.shape, fill, x.dtype)
    xr = (
        x
        if r == 0
        else jnp.concatenate([x[r:], jnp.full((r, C), fill, x.dtype)], axis=0)
    )
    if c == 0:
        return xr
    xr1 = jnp.concatenate(
        [xr[1:], jnp.full((1, C), fill, x.dtype)], axis=0
    )
    return jnp.concatenate([xr[:, c:], xr1[:, :c]], axis=1)


def _shift_prev_flat(x, fill, k, wrap=False):
    R, C = x.shape
    if not wrap:
        if k >= C:
            return jnp.full(x.shape, fill, x.dtype)
        return jnp.concatenate(
            [jnp.full((R, k), fill, x.dtype), x[:, :-k]], axis=1
        )
    r, c = divmod(k, C)
    if r >= R:
        return jnp.full(x.shape, fill, x.dtype)
    xr = (
        x
        if r == 0
        else jnp.concatenate([jnp.full((r, C), fill, x.dtype), x[:-r]], axis=0)
    )
    if c == 0:
        return xr
    xr1 = jnp.concatenate(
        [jnp.full((1, C), fill, x.dtype), xr[:-1]], axis=0
    )
    return jnp.concatenate([xr1[:, -c:], xr[:, :-c]], axis=1)


def _bits_for(n: int) -> int:
    return max(int(n - 1).bit_length(), 1)


def _flat_pos(shape, wrap):
    R, C = shape
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    if not wrap:
        return col
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return row * C + col


def _cumsum_rm(x, wrap):
    """Inclusive cumsum in row-major order ([R, C] int32)."""
    r = jnp.cumsum(x, axis=1)
    if not wrap:
        return r
    tot = r[:, -1]
    roff = jnp.cumsum(tot) - tot
    return r + roff[:, None]


def compact_left(vals, live, fills, wrap=False, max_shift=None):
    """Stable left-pack of live elements over a [R, C] array.

    With `wrap=False` each row is an independent stream (returns per-row
    counts int32[R]); with `wrap=True` the array is one row-major stream
    (returns the scalar total count).  vals: tuple of [R, C] arrays riding
    along; fills: per-array fill for vacated slots.

    Radix-4 (r5): each stage resolves a base-4 digit of the shift
    distance (3 shifted candidates + selects) — HALF the stages of the
    radix-2 form, and stage count is pass count is cost on this backend.
    Conflict-freedom survives: with d = hi*4^(s+1) + digit*4^s + lo, a
    stage-s collision between i < j forces hi_j < hi_i while d_j >= d_i
    forces hi_j >= hi_i — the radix-2 argument verbatim.

    `max_shift`: static bound on the largest move (= max #dead before a
    live element) when the caller knows one; trims the stage count."""
    R, C = vals[0].shape
    N = R * C if wrap else C
    cnt = _cumsum_rm(live.astype(jnp.int32), wrap)
    pos = _flat_pos(live.shape, wrap)
    d = jnp.where(live, pos - (cnt - 1), 0)
    n_bits = _bits_for(N if max_shift is None else min(max_shift + 1, N))
    n_stages = (n_bits + 1) // 2
    for s in range(n_stages):
        k = 1 << (2 * s)
        if k >= N:
            break
        dig = (d >> (2 * s)) & 3
        keep = live & (dig == 0)
        arrs = vals + (d,)
        fills_d = fills + (0,)
        outs = [jnp.where(keep, a, f) for a, f in zip(arrs, fills_d)]
        new_live = keep
        for q in (1, 2, 3):
            kq = q * k
            if kq >= N:
                break
            c_live = _shift_next_flat(live & (dig == q), False, kq, wrap)
            outs = [
                jnp.where(c_live, _shift_next_flat(a, f, kq, wrap), o)
                for o, a, f in zip(outs, arrs, fills_d)
            ]
            new_live = new_live | c_live
        vals = tuple(outs[:-1])
        # clear the resolved base-4 digit from the carried distance
        d = outs[-1] - (outs[-1] & (jnp.int32(3) * k))
        d = jnp.where(new_live, d, 0)
        live = new_live
    count = cnt[-1, -1] if wrap else cnt[:, -1]
    return vals, count


def _pad_to(vals, live, d, n_out, wrap, fills):
    R, C = vals[0].shape
    if wrap:
        assert n_out % C == 0, "wrap-mode n_out must be a multiple of C"
        R2 = n_out // C
        if R2 <= R:
            return vals, live, d
        padr = R2 - R

        def padv(v, f):
            return jnp.concatenate(
                [v, jnp.full((padr, C), f, v.dtype)], axis=0
            )

        return (
            tuple(padv(v, f) for v, f in zip(vals, fills)),
            padv(live, False),
            padv(d, 0),
        )
    if n_out <= C:
        return vals, live, d
    padc = n_out - C

    def padv(v, f):
        return jnp.concatenate([v, jnp.full((R, padc), f, v.dtype)], axis=1)

    return (
        tuple(padv(v, f) for v, f in zip(vals, fills)),
        padv(live, False),
        padv(d, 0),
    )


def spread_right(vals, count, tgt, fills, wrap=False, n_out=None,
                 max_shift=None):
    """Move the dense prefix (flat positions 0..count-1) to strictly-
    increasing targets `tgt` (read at the dense positions; t_i >= i).
    The inverse butterfly of `compact_left` (MSB-first, rightward pulls).

    `n_out`: output columns per row (wrap=False) or total flat elements
    (wrap=True, multiple of C).  Elements with targets >= n_out are
    dropped (callers guard).  Returns (vals', live')."""
    R, C = vals[0].shape
    if n_out is None:
        n_out = R * C if wrap else C
    pos = _flat_pos(tgt.shape, wrap)
    if wrap:
        live = pos < count
    else:
        live = pos < (count[:, None] if count.ndim == 1 else count)
    d = jnp.where(live, tgt - pos, 0)
    vals, live, d = _pad_to(vals, live, d, n_out, wrap, fills)
    N = n_out if wrap else max(n_out, C)
    n_bits = _bits_for(N if max_shift is None else min(max_shift + 1, N))
    n_stages = (n_bits + 1) // 2
    # radix-4, MSB-digit-first (the exact inverse of compact_left's
    # stage order — see its docstring for the conflict-freedom argument)
    for s in range(n_stages - 1, -1, -1):
        k = 1 << (2 * s)
        if k >= N:
            continue
        dig = (d >> (2 * s)) & 3
        keep = live & (dig == 0)
        arrs = vals + (d,)
        fills_d = fills + (0,)
        outs = [jnp.where(keep, a, f) for a, f in zip(arrs, fills_d)]
        new_live = keep
        for q in (1, 2, 3):
            kq = q * k
            if kq >= N:
                break
            c_live = _shift_prev_flat(live & (dig == q), False, kq, wrap)
            outs = [
                jnp.where(c_live, _shift_prev_flat(a, f, kq, wrap), o)
                for o, a, f in zip(outs, arrs, fills_d)
            ]
            new_live = new_live | c_live
        vals = tuple(outs[:-1])
        d = outs[-1] - (outs[-1] & (jnp.int32(3) * k))
        d = jnp.where(new_live, d, 0)
        live = new_live
    if not wrap and n_out < C:
        vals = tuple(v[:, :n_out] for v in vals)
        live = live[:, :n_out]
    if wrap and n_out < vals[0].shape[0] * C:
        r2 = n_out // C
        vals = tuple(v[:r2] for v in vals)
        live = live[:r2]
    return vals, live


def route_to(vals, live, tgt, fills, wrap=False, n_out=None, max_shift=None):
    """Route live elements (any positions) to strictly-increasing targets
    `tgt` (read at live positions), any direction, gaps allowed on both
    sides: compact left, then spread right."""
    (t_c, *v_c), cnt = compact_left(
        (jnp.where(live, tgt, 0),) + tuple(vals),
        live,
        (0,) + tuple(fills),
        wrap=wrap,
        max_shift=max_shift,
    )
    return spread_right(
        tuple(v_c), cnt, t_c, fills, wrap=wrap, n_out=n_out,
        max_shift=max_shift,
    )


# Backwards-compatible [1, N] aliases used by early tests.
def compact_left_flat(vals, live, fills, max_shift=None):
    return compact_left(vals, live, fills, wrap=False, max_shift=max_shift)


def spread_right_flat(vals, count, tgt, fills, n_out=None, max_shift=None):
    return spread_right(
        vals, count, tgt, fills, wrap=False, n_out=n_out, max_shift=max_shift
    )


def route_to_flat(vals, live, tgt, fills, n_out=None, max_shift=None):
    return route_to(
        vals, live, tgt, fills, wrap=False, n_out=n_out, max_shift=max_shift
    )
