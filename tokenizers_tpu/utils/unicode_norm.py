"""Alignment-tracking Unicode normalization.

Python's `unicodedata.normalize` gives no provenance for output chars, but the
pipeline must track, for every normalized char, which original char(s) it came
from (reference: the `unicode-normalization-alignments` crate used by
`tokenizers/src/tokenizer/normalizer.rs:450-471`). We therefore implement
NFD/NFKD/NFC/NFKC from Unicode data directly, emitting `(char, change)` streams
compatible with `NormalizedString.transform`:

  - change == 0 : this char replaces the next not-yet-consumed input char
  - change == 1 : this char is an insertion (inherits previous char's alignment)
  - change == -N: this char replaces the next input char AND consumes N more

The module also exposes the raw decomposition/composition helpers used by the
device-side normalizer table builders (`ops/normalize.py`).
"""

from __future__ import annotations

import sys
import unicodedata
from functools import lru_cache
from typing import Iterable, List, Optional, Tuple

# ---------------------------------------------------------------- Hangul (UAX#15)

_SBASE = 0xAC00
_LBASE = 0x1100
_VBASE = 0x1161
_TBASE = 0x11A7
_LCOUNT = 19
_VCOUNT = 21
_TCOUNT = 28
_NCOUNT = _VCOUNT * _TCOUNT
_SCOUNT = _LCOUNT * _NCOUNT


def _hangul_decompose(cp: int) -> Optional[List[int]]:
    s_index = cp - _SBASE
    if s_index < 0 or s_index >= _SCOUNT:
        return None
    l = _LBASE + s_index // _NCOUNT
    v = _VBASE + (s_index % _NCOUNT) // _TCOUNT
    t = _TBASE + s_index % _TCOUNT
    if t == _TBASE:
        return [l, v]
    return [l, v, t]


def _hangul_compose(a: int, b: int) -> Optional[int]:
    # L + V
    if _LBASE <= a < _LBASE + _LCOUNT and _VBASE <= b < _VBASE + _VCOUNT:
        return _SBASE + ((a - _LBASE) * _VCOUNT + (b - _VBASE)) * _TCOUNT
    # LV + T
    s_index = a - _SBASE
    if 0 <= s_index < _SCOUNT and s_index % _TCOUNT == 0:
        if _TBASE < b < _TBASE + _TCOUNT:
            return a + (b - _TBASE)
    return None


# ---------------------------------------------------------------- decomposition


@lru_cache(maxsize=None)
def canonical_decomposition(cp: int) -> Tuple[int, ...]:
    """Full recursive canonical decomposition of a codepoint (no reordering)."""
    h = _hangul_decompose(cp)
    if h is not None:
        return tuple(h)
    d = unicodedata.decomposition(chr(cp))
    if not d or d.startswith("<"):
        return (cp,)
    out: List[int] = []
    for part in d.split():
        out.extend(canonical_decomposition(int(part, 16)))
    return tuple(out)


@lru_cache(maxsize=None)
def compatibility_decomposition(cp: int) -> Tuple[int, ...]:
    """Full recursive compatibility decomposition of a codepoint (no reordering)."""
    h = _hangul_decompose(cp)
    if h is not None:
        return tuple(h)
    d = unicodedata.decomposition(chr(cp))
    if not d:
        return (cp,)
    parts = d.split()
    if parts[0].startswith("<"):
        parts = parts[1:]
    out: List[int] = []
    for part in parts:
        out.extend(compatibility_decomposition(int(part, 16)))
    return tuple(out)


def _canonical_order(chars: List[int], groups: List[int]) -> None:
    """Canonical (stable bubble) ordering of combining marks, in place.

    `groups[k]` is carried along with `chars[k]` so the caller can keep
    provenance through the reordering.
    """
    n = len(chars)
    if n < 2:
        return
    ccc = [unicodedata.combining(chr(c)) for c in chars]
    # insertion sort, stable, only among non-zero ccc runs (UAX#15 D108)
    i = 1
    while i < n:
        if ccc[i] != 0 and ccc[i - 1] > ccc[i]:
            j = i
            while j > 0 and ccc[j - 1] > ccc[j] and ccc[j] != 0:
                ccc[j - 1], ccc[j] = ccc[j], ccc[j - 1]
                chars[j - 1], chars[j] = chars[j], chars[j - 1]
                groups[j - 1], groups[j] = groups[j], groups[j - 1]
                j -= 1
        i += 1


def _decompose_with_groups(s: str, compat: bool) -> Tuple[List[int], List[int]]:
    """Decompose + canonically order; returns (codepoints, source char index)."""
    decomp = compatibility_decomposition if compat else canonical_decomposition
    chars: List[int] = []
    groups: List[int] = []
    for i, c in enumerate(s):
        for cp in decomp(ord(c)):
            chars.append(cp)
            groups.append(i)
    _canonical_order(chars, groups)
    return chars, groups


# ---------------------------------------------------------------- composition

_COMPOSITION_TABLE: Optional[dict] = None


def composition_table() -> dict:
    """Primary canonical composites: (starter_cp, cc_cp) -> composed_cp.

    Built by scanning all codepoints' canonical decompositions and excluding
    composition exclusions (detected via NFC round-trip).
    """
    global _COMPOSITION_TABLE
    if _COMPOSITION_TABLE is None:
        table = {}
        for cp in range(0x110000):
            if _SBASE <= cp < _SBASE + _SCOUNT:
                continue  # Hangul handled algorithmically
            c = chr(cp)
            d = unicodedata.decomposition(c)
            if not d or d.startswith("<"):
                continue
            parts = d.split()
            if len(parts) != 2:
                continue
            a, b = int(parts[0], 16), int(parts[1], 16)
            # composition exclusions: NFC of the decomposition must recompose
            if unicodedata.normalize("NFC", chr(a) + chr(b)) == c:
                table[(a, b)] = cp
        _COMPOSITION_TABLE = table
    return _COMPOSITION_TABLE


def _compose(chars: List[int]) -> Tuple[List[int], List[int]]:
    """UAX#15 canonical composition over a canonically-ordered sequence.

    Returns (output codepoints, source index in `chars` of each output char).
    Composition keeps the starter's position as the source.
    """
    table = composition_table()
    n = len(chars)
    out: List[int] = []
    src: List[int] = []
    i = 0
    while i < n:
        cp = chars[i]
        out.append(cp)
        src.append(i)
        starter_pos = len(out) - 1
        if unicodedata.combining(chr(cp)) != 0:
            i += 1
            continue
        # try to compose following chars with this starter
        last_ccc = 0
        j = i + 1
        while j < n:
            cj = chars[j]
            ccc = unicodedata.combining(chr(cj))
            composed = _hangul_compose(out[starter_pos], cj)
            if composed is None:
                composed = table.get((out[starter_pos], cj))
            if composed is not None and (last_ccc == 0 or last_ccc < ccc):
                out[starter_pos] = composed
                # consumed char cj: drop it
                j += 1
                if ccc == 0:
                    # composed a following starter (e.g. Hangul LV+T): continue
                    last_ccc = 0
                    continue
                continue
            if ccc == 0:
                break  # next starter blocks everything
            out.append(cj)
            src.append(j)
            last_ccc = ccc
            j += 1
        i = j
    return out, src


# ---------------------------------------------------------------- change streams


def nfd_transform(s: str, compat: bool = False) -> List[Tuple[str, int]]:
    """(char, change) stream applying NFD (or NFKD) to `s`.

    Grouping pattern is positional: for each input char with a k-char
    decomposition we emit one change-0 followed by (k-1) change-1 entries,
    applied to the canonically-reordered output in order.
    """
    decomp = compatibility_decomposition if compat else canonical_decomposition
    chars, groups = _decompose_with_groups(s, compat)
    # change pattern from group sizes, positional
    changes: List[int] = []
    for i, c in enumerate(s):
        k = len(decomp(ord(c)))
        changes.append(0)
        changes.extend([1] * (k - 1))
    return [(chr(cp), ch) for cp, ch in zip(chars, changes)]


def nfkd_transform(s: str) -> List[Tuple[str, int]]:
    return nfd_transform(s, compat=True)


def _source_map_to_transform(
    out_cps: List[int], src: List[Optional[int]], n_inputs: int
) -> Tuple[List[Tuple[str, int]], int]:
    """Serialize (output chars, monotone source positions) into a
    `(char, change)` stream plus initial_offset.

    `src[k]` is the input index the k-th output char replaces (strictly
    increasing over non-None entries) or None for insertions.
    """
    dest: List[Tuple[str, int]] = []
    initial_offset = 0
    # positions of non-insertion outputs
    cursor = 0
    first_real = next((k for k, p in enumerate(src) if p is not None), None)
    if first_real is not None and src[first_real] > 0:
        initial_offset = src[first_real]
        cursor = src[first_real]
    pending_removals_attach = -1  # index in dest of last non-insertion entry
    for k, (cp, p) in enumerate(zip(out_cps, src)):
        if p is None:
            dest.append((chr(cp), 1))
            continue
        # consume gap between cursor and p by attaching removals to previous entry
        gap = p - cursor
        if gap > 0:
            if pending_removals_attach >= 0:
                c_prev, ch_prev = dest[pending_removals_attach]
                dest[pending_removals_attach] = (c_prev, ch_prev - gap)
            else:
                initial_offset += gap
            cursor = p
        dest.append((chr(cp), 0))
        pending_removals_attach = len(dest) - 1
        cursor += 1
    # trailing removals
    if cursor < n_inputs:
        gap = n_inputs - cursor
        if pending_removals_attach >= 0:
            c_prev, ch_prev = dest[pending_removals_attach]
            dest[pending_removals_attach] = (c_prev, ch_prev - gap)
        else:
            initial_offset += gap
    return dest, initial_offset


def nfc_transform(s: str, compat: bool = False) -> Tuple[List[Tuple[str, int]], int]:
    """(char, change) stream + initial_offset applying NFC (or NFKC) to `s`."""
    chars, _ = _decompose_with_groups(s, compat)
    out, src_in_decomp = _compose(chars)
    # map decomposed positions back to input char positions via grouping:
    # decomposed char j belongs to input group groups[j]
    _, groups = _decompose_with_groups(s, compat)
    # source input position of each output char = group of its decomposed source,
    # but we must keep it strictly monotone; composition keeps starters in order
    src: List[Optional[int]] = []
    last = -1
    for j in src_in_decomp:
        g = groups[j]
        if g <= last:
            src.append(None)  # fell behind (reordered mark): treat as insertion
        else:
            src.append(g)
            last = g
    return _source_map_to_transform([cp for cp in out], src, len(s))


def nfkc_transform(s: str) -> Tuple[List[Tuple[str, int]], int]:
    return nfc_transform(s, compat=True)
