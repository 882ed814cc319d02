"""Llama-3 pre-split boundaries on device (no regex, no backtracking).

The Llama-3 split pattern (reference fixture `tokenizer.json`, run through
Oniguruma in the reference via `pre_tokenizers/split.rs`):

    (?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\\r\\n\\p{L}\\p{N}]?\\p{L}+|\\p{N}{1,3}|
     ?[^\\s\\p{L}\\p{N}]+[\\r\\n]*|\\s*[\\r\\n]+|\\s+(?!\\S)|\\s+

Its match-start positions reduce to local char-class rules plus three cheap
row scans (validated exhaustively against the regex backend in tests):

  * letters: extend the run; absorbed into a preceding single non-NL
    non-letter non-digit char when that char itself starts a match
    (`[^\\r\\n..]?` prefix) — which is local in the class two chars back;
  * digits: split every 3 chars from the digit-run start (`\\p{N}{1,3}`);
  * punct runs absorb a following `[\\r\\n]*` suffix;
  * whitespace runs split after the *last* newline (`\\s*[\\r\\n]+`), then
    GPT-2-style before-word attachment for the non-NL tail;
  * contractions are case-insensitive, including U+017F (ſ) folding to 's'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bpe_encode import _shift_next, _shift_prev
from .unicode_tables import CLS_END, CLS_L, CLS_N, CLS_O, CLS_SP, CLS_WS, PAGE_BITS

CLS_NL = 7  # \r / \n — a class the shared tables fold into WS; split here


def _seg_or_reverse(val, run, run_end):
    """Suffix-OR of `val` within contiguous True-runs of `run`."""

    def op(a, b):
        (v1, f1), (v2, f2) = a, b
        return jnp.where(f2, v2, v1 | v2), f1 | f2

    out, _ = jax.lax.associative_scan(op, (val, run_end), axis=1, reverse=True)
    return out & run


def _seg_fill_forward(head_val, head, run):
    """Forward-fill head_val from each run head through its True-run."""

    def op(a, b):
        (v1, f1), (v2, f2) = a, b
        return jnp.where(f2, v2, v1 | v2), f1 | f2

    out, _ = jax.lax.associative_scan(op, (head_val, head), axis=1)
    return out & run


def llama3_boundaries(b, inb, cls_table, ascii_only=False):
    """Match-start mask over packed bytes. b int32[B,L] (0 outside), inb bool.

    cls_table: flat int8[0x110000] codepoint->class table.  `ascii_only`
    (static): all bytes < 128 — skips the UTF-8 decode and the class-table
    gather (see `bpe_encode.ascii_cls`)."""
    B, L = b.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    length = jnp.sum(inb.astype(jnp.int32), axis=1, keepdims=True)

    b1 = _shift_next(b, 0)
    b2 = _shift_next(b, 0, 2)

    if ascii_only:
        from .bpe_encode import ascii_cls

        is_start = inb
        cls = ascii_cls(b)
        cls = jnp.where((b == 0x0A) | (b == 0x0D), CLS_NL, cls)
        cls_fill = cls
        prev_cls = jnp.where(pos == 0, CLS_END, _shift_prev(cls_fill, CLS_END))
        pp_cls = jnp.where(
            pos <= 1, CLS_END, _shift_prev(cls_fill, CLS_END, 2)
        )
        next_exists = (pos + 1) < length
        next_cls = jnp.where(next_exists, _shift_next(cls_fill, -1), CLS_END)
    else:
        is_cont = (b & 0xC0) == 0x80
        is_start = inb & ~is_cont
        charlen = (
            1
            + (b >= 0xC0).astype(jnp.int32)
            + (b >= 0xE0).astype(jnp.int32)
            + (b >= 0xF0).astype(jnp.int32)
        )

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
        cp = jnp.clip(cp, 0, 0x10FFFF)
        from .merge_table import take_row8

        cls = take_row8(cp, cls_table).astype(jnp.int32)
        cls = jnp.where((b == 0x0A) | (b == 0x0D), CLS_NL, cls)

        # forward-fill class and char-start position over continuation bytes
        f = jnp.where(is_start, cls, -1)
        sp = jnp.where(is_start, pos, -1)
        for _ in range(3):
            f = jnp.where(f >= 0, f, _shift_prev(f, -1))
            sp = jnp.where(sp >= 0, sp, _shift_prev(sp, -1))
        cls_fill, start_fill = f, sp

        prev_cls = jnp.where(pos == 0, CLS_END, _shift_prev(cls_fill, CLS_END))
        # class of the char two chars back: prev_cls evaluated at the previous
        # char's start, which is 1..4 bytes back — shifted selects, no gather
        prev_arr = jnp.where(pos == 0, CLS_END, _shift_prev(cls_fill, CLS_END))
        d1 = pos - _shift_prev(start_fill, 0)  # distance to prev char start
        pp_cls_raw = _shift_prev(prev_arr, CLS_END)
        for k in (2, 3, 4):
            pp_cls_raw = jnp.where(
                d1 == k, _shift_prev(prev_arr, CLS_END, k), pp_cls_raw
            )
        pp_cls = jnp.where(pos <= 1, CLS_END, pp_cls_raw)

        # class of the next char: distance charlen in {1..4} — shifted selects
        next_exists = (pos + charlen) < length
        next_cls_raw = _shift_next(cls_fill, -1)
        for k in (2, 3, 4):
            next_cls_raw = jnp.where(
                charlen == k, _shift_next(cls_fill, -1, k), next_cls_raw
            )
        next_cls = jnp.where(next_exists, next_cls_raw, CLS_END)

    def ws_c(c):
        return (c == CLS_SP) | (c == CLS_WS) | (c == CLS_NL)

    is_ws_b = ws_c(cls_fill) & inb  # per byte (continuation bytes included)
    is_nl_b = (cls_fill == CLS_NL) & inb

    # ---- scans -----------------------------------------------------------
    # nlge: any NL at >= this byte within the same ws run
    ws_next = _shift_next(is_ws_b, False)
    run_end = is_ws_b & ~ws_next
    nlge = _seg_or_reverse(is_nl_b, is_ws_b, run_end)
    # absorbed_nl: NL-run directly continuing a punct run (b4's [\r\n]* tail)
    prev_b_cls = _shift_prev(cls_fill, CLS_END)
    nl_head = is_nl_b & (prev_b_cls != CLS_NL)
    absorbed_nl = _seg_fill_forward(
        nl_head & (prev_b_cls == CLS_O), nl_head, is_nl_b
    )
    # digit-run char offsets: chars since the digit run's first char —
    # a segmented count resetting at each run head (no gather)
    dig_start = is_start & (cls == CLS_N) & (prev_cls != CLS_N)

    def op_seg(a, bb):
        (v1, f1), (v2, f2) = a, bb
        return jnp.where(f2, v2, v1 + v2), f1 | f2

    incl, _ = jax.lax.associative_scan(
        op_seg, (is_start.astype(jnp.int32), dig_start), axis=1
    )
    dig_off = incl - 1  # 0 at the run head, garbage outside runs (masked)

    # ---- contractions (case-insensitive, ſ folds to s) -------------------
    apo = is_start & (b == 0x27)
    p_ok = (prev_cls != CLS_O) & (prev_cls != CLS_SP)

    def ci(x, lo):
        return (x == ord(lo)) | (x == ord(lo.upper()))

    sfold = (b1 == 0xC5) & (b2 == 0xBF)  # U+017F ſ
    is2a = ci(b1, "s") | ci(b1, "t") | ci(b1, "m") | ci(b1, "d")
    is3 = (
        (ci(b1, "r") & ci(b2, "e"))
        | (ci(b1, "v") & ci(b2, "e"))
        | (ci(b1, "l") & ci(b2, "l"))
    )
    blen = jnp.where(
        is3 & ((pos + 2) < length),
        3,
        jnp.where(
            is2a & ((pos + 1) < length),
            2,
            jnp.where(sfold & ((pos + 2) < length), 3, 0),
        ),
    )
    contr = apo & p_ok & (blen > 0)

    def shl(x, k):
        return jnp.concatenate(
            [jnp.zeros((B, k), dtype=bool), x[:, : L - k]], axis=1
        )

    c2 = contr & (blen == 2)
    c3 = contr & (blen == 3)
    interior = shl(contr, 1) | shl(c3, 2)
    contr_end = shl(c2, 2) | shl(c3, 3)

    # ---- per-class boundary rules ----------------------------------------
    p = prev_cls
    is_ws_prev = ws_c(p)
    nlge_prev = _shift_prev(nlge, False)
    absorbed_prev = _shift_prev(absorbed_nl, False)
    next_nonws = next_exists & ~ws_c(next_cls) & (next_cls != CLS_END)

    b_letter = jnp.where(
        p == CLS_L,
        False,
        jnp.where(
            (p == CLS_SP) | (p == CLS_WS),
            False,  # absorbed as the optional one-char prefix
            jnp.where(
                p == CLS_O,
                (pp_cls == CLS_O) | (pp_cls == CLS_SP),
                True,  # N, NL, BOS
            ),
        ),
    )
    b_digit = (p != CLS_N) | (dig_off % 3 == 0)
    b_punct = (p != CLS_O) & (p != CLS_SP)
    b_ws = ~absorbed_nl & (
        ~is_ws_prev
        | ((p == CLS_NL) & (~nlge | absorbed_prev))
        | (next_nonws & is_ws_prev & (p != CLS_NL) & ~nlge_prev)
    )

    bnd = jnp.where(
        cls == CLS_L,
        b_letter,
        jnp.where(
            cls == CLS_N, b_digit, jnp.where(cls == CLS_O, b_punct, b_ws)
        ),
    )
    bnd = bnd | (pos == 0) | contr_end
    bnd = bnd & ~interior & is_start & inb
    return bnd, is_start
