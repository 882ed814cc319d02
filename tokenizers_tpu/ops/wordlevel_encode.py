"""TPU WordLevel encode: pre-split + exact whole-word vocab lookup.

Replaces the reference host path (`models/wordlevel/mod.rs:162` — HashMap
lookup per word with unk fallback) with one jitted program over packed
uint8[B, L] byte batches:

1.  **Pre-split** by char-class tables (no regex at runtime; the tables are
    generated from the same `regex` module the host pipeline uses):
      * ``whitespace``        — `\\w+|[^\\w\\s]+` (reference
        `pre_tokenizers/whitespace.rs:12`)
      * ``whitespace_split``  — split on `\\s` (whitespace.rs:33)
      * ``bert``              — whitespace remove + punctuation isolate
        (`pre_tokenizers/bert.rs:11`)
2.  **Whole-word hash**: a segmented affine scan accumulates each word's
    double rolling hash (whitespace bytes contribute the scan identity, so
    removed bytes never affect a word's hash); one cuckoo-table lookup per
    byte position (masked to word heads) maps hash -> token id, miss ->
    ``unk_id``.  Hash equality stands in for string equality (two 32-bit
    hashes + exact length, ~2^-64 collision odds per pair — see README
    "fingerprint tradeoff").

Normalizers run host-side in `_prepare` (WordLevel emits one token per
word, ids only; the offsets path falls back to the host pipeline).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_merge2 import fill_next
from .merge_table import hash_jnp
from .unicode_tables import MAX_CP, PAGE_BITS

H1_MULT = np.uint32(0x01000193)
H2_MULT = np.uint32(0x0000C597)

# unified pre-split classes
WL_WS = 0
WL_A = 1  # \w word chars (whitespace kind) / catch-all (other kinds)
WL_B = 2  # non-word non-space runs (whitespace kind)
WL_PUNCT = 3  # isolated single-char words (bert kind)
WL_END = -2

_cls_cache: dict = {}


def wordlevel_class_tables(kind: str):
    """Two-stage codepoint->class tables per pre-split kind."""
    if kind in _cls_cache:
        return _cls_cache[kind]
    from .bert_tables import _cache_path

    fname = _cache_path(f"wlclass_{kind}_v1.npz")
    if os.path.exists(fname):
        z = np.load(fname)
        _cls_cache[kind] = (z["s1"], z["s2"])
        return _cls_cache[kind]

    cls = np.full(MAX_CP, WL_A, np.int8)
    if kind == "bert":
        from .bert_tables import (
            BERT_OTHER,
            BERT_PUNCT,
            BERT_WS,
            bert_class_tables,
        )

        s1, s2 = bert_class_tables()
        remap = np.zeros(256, np.int8)
        remap[BERT_WS] = WL_WS
        remap[BERT_PUNCT] = WL_PUNCT
        remap[BERT_OTHER] = WL_A
        _cls_cache[kind] = (s1, remap[s2])
        return _cls_cache[kind]

    import regex as _re

    from .unicode_tables import _WS_CODEPOINTS

    ws = np.array(_WS_CODEPOINTS + [0x20], dtype=np.int64)
    if kind == "whitespace":
        # \w per the regex module (host `Whitespace` uses the same module)
        cps = np.concatenate(
            [
                np.arange(0, 0xD800, dtype=np.int64),
                np.arange(0xE000, MAX_CP, dtype=np.int64),
            ]
        )
        all_chars = "".join(map(chr, cps.tolist()))
        hits = _re.compile(r"\w", _re.V0).findall(all_chars)
        idx = np.array([ord(c) for c in hits], dtype=np.int64)
        cls[:] = WL_B
        cls[idx] = WL_A
        cls[ws] = WL_WS
    elif kind == "whitespace_split":
        cls[ws] = WL_WS
    else:  # pragma: no cover
        raise ValueError(kind)

    pages = cls.reshape(-1, 1 << PAGE_BITS)
    uniq, s1 = np.unique(pages, axis=0, return_inverse=True)
    _cls_cache[kind] = (s1.astype(np.int32), uniq.reshape(-1))
    np.savez_compressed(fname, s1=_cls_cache[kind][0], s2=_cls_cache[kind][1])
    return _cls_cache[kind]


@functools.partial(jax.jit, static_argnames=("with_offsets",))
def wordlevel_program(
    bytes_u8,
    lengths,
    cls_s1,
    cls_s2,
    vkey_a,
    vkey_b,
    vlen,
    vid,
    vseed,
    unk_id,
    with_offsets=False,
):
    """-> (ids int32[B, W], ntok int32[B], row_bad bool[B]); W = L//2+1.

    With `with_offsets`, additionally (starts, ends, words): per-token byte
    spans in the PREPARED (host-normalized) text + per-token word index —
    each WordLevel token IS one pre-split word, so spans are the word
    extents (reference `models/wordlevel/mod.rs:162-186` tokens carry the
    split's offsets).

    row_bad: rows with more words than W (pathological; host fallback)."""
    from .wordpiece_encode import _decode_chars

    B, L = bytes_u8.shape
    b = bytes_u8.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    inb = pos < lengths[:, None]
    b = jnp.where(inb, b, 0)

    # ---- pre-split -------------------------------------------------------
    cp, is_start, _ = _decode_chars(b, inb)
    from .merge_table import take_row8

    page = take_row8(cp >> PAGE_BITS, cls_s1)
    cls = take_row8(
        (page << PAGE_BITS) | (cp & ((1 << PAGE_BITS) - 1)), cls_s2
    ).astype(
        jnp.int32
    )
    # fill class over continuation bytes
    f = jnp.where(is_start, cls, -1)
    for _ in range(3):
        f = jnp.where(
            f >= 0,
            f,
            jnp.concatenate(
                [jnp.full((B, 1), -1, jnp.int32), f[:, :-1]], axis=1
            ),
        )
    cls_fill = jnp.where(inb, f, WL_END)
    is_ws = inb & (cls_fill == WL_WS)
    is_word_b = inb & ~is_ws
    prev_cls = jnp.concatenate(
        [jnp.full((B, 1), WL_END, jnp.int32), cls_fill[:, :-1]], axis=1
    )
    bnd = (
        is_start
        & is_word_b
        & (
            (prev_cls == WL_WS)
            | (prev_cls == WL_END)
            | (cls != prev_cls)
            | (cls == WL_PUNCT)
        )
    )

    # ---- whole-word double hash via segmented affine scan ----------------
    def word_hash(mult):
        def op(x, y):
            (a1, c1, f1), (a2, c2, f2) = x, y
            a = jnp.where(f2, a2, a1 * a2)
            c = jnp.where(f2, c2, c1 * a2 + c2)
            return a, c, f1 | f2

        # whitespace / out-of-text bytes carry the identity (1, 0) so the
        # hash at any position after a word's last byte equals the word's
        a0 = jnp.where(is_word_b, jnp.uint32(mult), jnp.uint32(1))
        c0 = jnp.where(is_word_b, (b + 1).astype(jnp.uint32), jnp.uint32(0))
        _, h, _ = jax.lax.associative_scan(op, (a0, c0, bnd), axis=1)
        return h.astype(jnp.int32)

    h1 = word_hash(H1_MULT)
    h2 = word_hash(H2_MULT)
    # word byte-length (for the exact-length check in the table)
    wlen_inc = jnp.cumsum(is_word_b.astype(jnp.int32), axis=1)

    # deliver each word's final (hash, len) at its head: the word ends at
    # the last word-byte before the next head (or text end); values at any
    # position in [last word byte, next head) are already the word's finals
    # thanks to the identity padding, so read them at (next head - 1)
    nxt_head = fill_next(
        [jnp.where(bnd, pos, 0)], bnd, k_steps=17
    )
    (nh,), nfnd = nxt_head
    last_before = jnp.where(nfnd, nh - 1, lengths[:, None] - 1)
    last_before = jnp.clip(last_before, 0, L - 1)
    wh1 = jnp.take_along_axis(h1, last_before, axis=1)
    wh2 = jnp.take_along_axis(h2, last_before, axis=1)
    wl = jnp.take_along_axis(wlen_inc, last_before, axis=1) - (
        wlen_inc - is_word_b.astype(jnp.int32)
    )

    # ---- vocab lookup ----------------------------------------------------
    vmask = vkey_a.shape[1] - 1
    g0 = hash_jnp(wh1, wh2, vseed, vmask, 0)
    g1 = hash_jnp(wh1, wh2, vseed, vmask, 1)
    hit0 = (vkey_a[0][g0] == wh1) & (vkey_b[0][g0] == wh2)
    hit1 = (vkey_a[1][g1] == wh1) & (vkey_b[1][g1] == wh2)
    stored_l = jnp.where(hit0, vlen[0][g0], vlen[1][g1])
    stored_id = jnp.where(hit0, vid[0][g0], vid[1][g1])
    hit = bnd & (hit0 | hit1) & (stored_l == wl)
    out_id = jnp.where(hit, stored_id, unk_id)

    # ---- compact: one token per word ------------------------------------
    W = L // 2 + 1
    k = jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1
    ntok = jnp.sum(bnd.astype(jnp.int32), axis=1)
    row_bad = ntok > W
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
    tgt = jnp.where(bnd, jnp.minimum(k, W), W)

    def pack(x, fill=-1):
        return (
            jnp.full((B, W + 1), fill, jnp.int32)
            .at[rows, tgt]
            .set(jnp.where(bnd, x, fill))[:, :W]
        )

    out = pack(out_id)
    if not with_offsets:
        return out, ntok, row_bad
    starts = pack(pos, 0)
    ends = pack(pos + wl, 0)
    opos = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    words = jnp.where(opos < ntok[:, None], opos, -1)
    return out, ntok, row_bad, starts, ends, words
