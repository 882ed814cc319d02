"""Pallas-fused pre-merge layout stages (ASCII gpt2 path).

The profiled cost of the ascii encode program (PERF.md round 3) puts
~10 ms/2MB-chunk in boundary detection + the two word-hash segmented scans
— dozens of elementwise/shift XLA ops over the full [B, L] grid.  This
kernel fuses them into ONE VMEM pass per row block:

    bytes -> ascii char classes -> GPT-2 split boundaries (incl. the
    contraction lookahead) -> next-boundary positions (reverse doubling
    min) -> both rolling word hashes (segmented affine scans, delivered at
    word heads).

Outputs feed `dedup_layout` directly (which skips its own
`word_hash_heads` when hashes are supplied).  Same Mosaic rules as
merge_pallas.py: no associative_scan, masks cross shifts as int32, all
scans hand-rolled Hillis-Steele doubling.  The lax path stays the oracle;
fuzzed in tests/test_layout_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .merge_pallas import RB, _shn, _shp, fill_next_i
from .unicode_tables import CLS_END, CLS_L, CLS_N, CLS_O, CLS_SP, CLS_WS

H1_MULT = np.int32(np.uint32(0x01000193).astype(np.int32))
H2_MULT = np.int32(np.uint32(0x0000C597).astype(np.int32))
BIGP = np.int32(0x7FFFFFFF)


def supported(shape) -> bool:
    _B, L = shape
    return L % 128 == 0 and L >= 256


def _seg_affine_2(c0, mult1, mult2, bnd_i, C):
    """Two segmented affine scans (inclusive, forward) sharing flags:
    h_i = h_{i-1} * MULT + c0_i, restarting where bnd.  Returns (h1, h2)."""
    a1 = jnp.full(c0.shape, mult1, jnp.int32)
    a2 = jnp.full(c0.shape, mult2, jnp.int32)
    h1 = c0
    h2 = c0
    f = bnd_i
    d = 1
    while d < C:
        p_a1 = _shp(a1, 1, d)
        p_a2 = _shp(a2, 1, d)
        p_h1 = _shp(h1, 0, d)
        p_h2 = _shp(h2, 0, d)
        p_f = _shp(f, 1, d)
        done = f > 0
        h1 = jnp.where(done, h1, p_h1 * a1 + h1)
        h2 = jnp.where(done, h2, p_h2 * a2 + h2)
        a1 = jnp.where(done, a1, p_a1 * a1)
        a2 = jnp.where(done, a2, p_a2 * a2)
        f = f | p_f
        d *= 2
    return h1, h2


def _kernel(b_ref, len_ref, bnd_o, nxt_o, h1_o, h2_o, *, L):
    b = b_ref[:]
    length = len_ref[:]  # [RB, 1]
    R = b.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    inb = (pos < length).astype(jnp.int32)
    b = jnp.where(inb > 0, b, 0)

    # ---- ascii char classes (bpe_encode.ascii_cls) -----------------------
    bl = b | 32
    is_l = (bl >= 97) & (bl <= 122)
    is_n = (b >= 48) & (b <= 57)
    is_ws = (b >= 9) & (b <= 13)
    cls = jnp.where(
        is_l,
        CLS_L,
        jnp.where(
            is_n,
            CLS_N,
            jnp.where(b == 32, CLS_SP, jnp.where(is_ws, CLS_WS, CLS_O)),
        ),
    ).astype(jnp.int32)

    prev_cls = _shp(cls, CLS_END, 1)
    prev_cls = jnp.where(pos == 0, CLS_END, prev_cls)
    next_exists = (pos + 1) < length
    next_cls = jnp.where(next_exists, _shn(cls, -1, 1), CLS_END)

    b1 = _shn(b, 0, 1)
    b2 = _shn(b, 0, 2)

    # contraction: 's|'t|'re|'ve|'m|'ll|'d at a match-start apostrophe
    apo = (inb > 0) & (b == 0x27)
    p_ok = (
        (pos == 0)
        | (prev_cls == CLS_L)
        | (prev_cls == CLS_N)
        | (prev_cls == CLS_WS)
    )
    is3 = (
        ((b1 == ord("r")) & (b2 == ord("e")))
        | ((b1 == ord("v")) & (b2 == ord("e")))
        | ((b1 == ord("l")) & (b2 == ord("l")))
    ) & ((pos + 2) < length)
    is2 = (
        (b1 == ord("s")) | (b1 == ord("t")) | (b1 == ord("m"))
        | (b1 == ord("d"))
    ) & ((pos + 1) < length)
    contr = apo & p_ok & (is3 | is2)
    contr3 = (contr & is3).astype(jnp.int32)
    contr2 = (contr & ~is3).astype(jnp.int32)
    contr_i = contr.astype(jnp.int32)

    interior = (_shp(contr_i, 0, 1) | _shp(contr3, 0, 2)) > 0
    contr_end = (_shp(contr2, 0, 2) | _shp(contr3, 0, 3)) > 0

    c_is_ws = (cls == CLS_SP) | (cls == CLS_WS)
    p_is_ws = (prev_cls == CLS_SP) | (prev_cls == CLS_WS)
    n_nonws = next_exists & (next_cls != CLS_SP) & (next_cls != CLS_WS)

    # int32 0/1 throughout: mixing python bool scalars into where() makes
    # Mosaic emit an unsupported i8 -> i1 truncation
    one = jnp.ones_like(cls)
    zero = jnp.zeros_like(cls)
    b_nonws = jnp.where(
        prev_cls == CLS_SP,
        zero,
        jnp.where(
            prev_cls == CLS_WS,
            one,
            jnp.where(
                prev_cls == CLS_L,
                (cls != CLS_L).astype(jnp.int32),
                jnp.where(
                    prev_cls == CLS_N,
                    (cls != CLS_N).astype(jnp.int32),
                    ((cls == CLS_L) | (cls == CLS_N)).astype(jnp.int32),
                ),
            ),
        ),
    )
    b_ws = jnp.where(p_is_ws, n_nonws.astype(jnp.int32), one)
    bnd_i = jnp.where(c_is_ws, b_ws, b_nonws)
    bnd_i = bnd_i | (pos == 0).astype(jnp.int32) | contr_end.astype(jnp.int32)
    bnd_i = bnd_i * (~interior).astype(jnp.int32) * inb
    bnd = bnd_i > 0
    bnd_o[:] = bnd_i

    # ---- next boundary position (reverse doubling min) -------------------
    nbp = jnp.where(bnd, pos, BIGP)
    d = 1
    while d < L:
        nbp = jnp.minimum(nbp, _shn(nbp, BIGP, d))
        d *= 2
    nxt_o[:] = _shn(nbp, BIGP, 1)

    # ---- word hashes, delivered at heads ----------------------------------
    h1, h2 = _seg_affine_2((b + 1), H1_MULT, H2_MULT, bnd_i, L)
    nxt_in = _shn(inb, 0, 1) > 0
    nxt_head = _shn(bnd_i, 0, 1) > 0
    is_end = (inb > 0) & (nxt_head | ~nxt_in)
    # k=9 covers WORD_CAP (longer words are row_bad upstream) and keeps
    # this bit-equal to the lax word_hash_heads oracle
    (he1, he2), fnd = fill_next_i([h1, h2], is_end, 9)
    h1_o[:] = jnp.where(is_end, h1, jnp.where(fnd, he1, 0))
    h2_o[:] = jnp.where(is_end, h2, jnp.where(fnd, he2, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def layout_fused(bytes_i32, lengths, interpret=False):
    """(b int32[B, L] zeroed outside text, lengths int32[B]) ->
    (bnd bool, nxt_bnd int32, h1 int32, h2 int32), all [B, L].

    ASCII gpt2 pre-split boundaries + next-boundary positions + both word
    rolling hashes at head positions, one fused VMEM pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B0, L = bytes_i32.shape
    lengths2 = lengths[:, None].astype(jnp.int32)
    if B0 % RB:
        pad = RB - B0 % RB
        bytes_i32 = jnp.concatenate(
            [bytes_i32, jnp.zeros((pad, L), jnp.int32)], axis=0
        )
        lengths2 = jnp.concatenate(
            [lengths2, jnp.zeros((pad, 1), jnp.int32)], axis=0
        )
    B = bytes_i32.shape[0]
    grid = (B // RB,)
    blk = pl.BlockSpec((RB, L), lambda i: (i, 0))
    blk1 = pl.BlockSpec((RB, 1), lambda i: (i, 0))
    bnd, nxt, h1, h2 = pl.pallas_call(
        functools.partial(_kernel, L=L),
        grid=grid,
        in_specs=[blk, blk1],
        out_specs=[blk] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, L), jnp.int32)] * 4,
        interpret=interpret,
    )(bytes_i32, lengths2)
    if B != B0:
        bnd, nxt, h1, h2 = bnd[:B0], nxt[:B0], h1[:B0], h2[:B0]
    return bnd > 0, nxt, h1, h2
