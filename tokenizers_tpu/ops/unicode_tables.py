"""Unicode character-class tables for on-device pre-tokenization.

The reference resolves `\\p{L}` / `\\p{N}` / `\\s` through Oniguruma at match
time (reference `tokenizers/src/utils/onig.rs`, pattern at
`pre_tokenizers/byte_level.rs:43-46`).  On TPU we instead precompute a
two-stage codepoint -> class table once on the host and gather through it on
device: `page = stage1[cp >> PAGE_BITS]`, `cls = stage2[page << PAGE_BITS |
(cp & PAGE_MASK)]`.  Class definitions are generated from the same `regex`
module the host pipeline uses (`tokenizers_tpu/pattern.py`), so host and
device agree byte-for-byte.

Classes (int8):
    0 = O   other (non-space, non-letter, non-number)
    1 = L   \\p{L}
    2 = N   \\p{N}
    3 = SP  literal space U+0020 (the only char matched by the ` ?` branches)
    4 = WS  other \\p{White_Space} per Oniguruma \\s (pattern.py _SPACE_INNER)
"""

from __future__ import annotations

import numpy as np

CLS_O = 0
CLS_L = 1
CLS_N = 2
CLS_SP = 3
CLS_WS = 4
CLS_END = 5  # sentinel for "no char" (start/end of text)

PAGE_BITS = 8
PAGE_SIZE = 1 << PAGE_BITS
MAX_CP = 0x110000

# Oniguruma \s (see tokenizers_tpu/pattern.py _SPACE_INNER)
_WS_CODEPOINTS = (
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)

_cached = None


def _full_class_array() -> np.ndarray:
    """int8[MAX_CP] char class per codepoint."""
    import regex as _re

    cls = np.zeros(MAX_CP, dtype=np.int8)
    # all assignable codepoints except surrogates (which cannot appear in
    # well-formed UTF-8 from Python strings)
    cps = np.concatenate(
        [np.arange(0, 0xD800, dtype=np.int64), np.arange(0xE000, MAX_CP, dtype=np.int64)]
    )
    all_chars = "".join(map(chr, cps.tolist()))
    for pat, value in ((r"\p{L}", CLS_L), (r"\p{N}", CLS_N)):
        hits = _re.compile(pat, _re.V0).findall(all_chars)
        idx = np.array([ord(c) for c in hits], dtype=np.int64)
        cls[idx] = value
    ws = np.array(_WS_CODEPOINTS, dtype=np.int64)
    cls[ws] = CLS_WS
    cls[0x20] = CLS_SP
    return cls


def char_class_tables():
    """Two-stage table: (stage1 int32[MAX_CP >> PAGE_BITS], stage2 int8[n_pages << PAGE_BITS]).

    Deduplicates identical 256-codepoint pages; ~40KB total instead of 1.1MB.
    """
    global _cached
    if _cached is not None:
        return _cached
    cls = _full_class_array()
    pages = cls.reshape(-1, PAGE_SIZE)
    uniq, stage1 = np.unique(pages, axis=0, return_inverse=True)
    stage2 = uniq.reshape(-1)
    _cached = (stage1.astype(np.int32), stage2.astype(np.int8))
    return _cached


_cached_flat = None


def char_class_flat():
    """Flat int8[0x110000] codepoint->class table.

    One device gather per codepoint instead of the two-stage pair; 1.1MB of
    device memory is nothing, and gather cost on this backend is per-index,
    so halving lookups halves the pre-split's gather bill."""
    global _cached_flat
    if _cached_flat is None:
        _cached_flat = _full_class_array().astype(np.int8)
    return _cached_flat
