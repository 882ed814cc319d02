"""Pattern: unified match-splitting over literals, predicates and regexes.

Mirrors the behavior of reference `tokenizers/src/tokenizer/pattern.rs:6-129`,
except offsets here are **char** offsets (callers convert to bytes where
needed; Python strings are char-indexed).

`find_matches(pattern, s)` returns contiguous `((start, end), is_match)`
slices covering all of `s`.
"""

from __future__ import annotations

import re as _std_re
from typing import Callable, List, Tuple, Union

import regex as _re

Offsets = Tuple[int, int]


class Invert:
    """Flips `is_match` of the wrapped pattern (reference `pattern.rs:123`)."""

    def __init__(self, pattern):
        self.pattern = pattern


# Oniguruma character class semantics (the reference's SysRegex backend,
# `utils/onig.rs`), probed against the reference:
#   \w == [\p{Alphabetic}\p{M}\p{Nd}\p{Pc}]   (NO Join_Control, unlike rust-regex)
#   \s == \p{White_Space}
# Python's `regex` module differs slightly (\x1C-\x1F in \s), so patterns are
# rewritten to explicit classes before compiling.
# (probed: onig also counts Latin-1 superscripts/fractions as word chars)
_WORD_INNER = r"\p{Alphabetic}\p{M}\p{Nd}\p{Pc}²³¹¼-¾"
_SPACE_INNER = (
    "\\t\\n\\x0B\\f\\r \\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000"
)


def translate_rust_regex(pattern: str) -> str:
    out = []
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "w":
                out.append(f"[{_WORD_INNER}]" if not in_class else _WORD_INNER)
                i += 2
                continue
            if nxt == "W" and not in_class:
                out.append(f"[^{_WORD_INNER}]")
                i += 2
                continue
            if nxt == "s":
                out.append(f"[{_SPACE_INNER}]" if not in_class else _SPACE_INNER)
                i += 2
                continue
            if nxt == "S" and not in_class:
                out.append(f"[^{_SPACE_INNER}]")
                i += 2
                continue
            out.append(c)
            out.append(nxt)
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        out.append(c)
        i += 1
    return "".join(out)


class SysRegex:
    """Regex backend (the reference switches onig/fancy-regex; we use the
    `regex` module which supports lookahead and unicode properties)."""

    __slots__ = ("pattern", "_compiled")

    def __init__(self, pattern: str):
        self.pattern = pattern
        self._compiled = _re.compile(translate_rust_regex(pattern), _re.V0)

    def find_iter(self, s: str):
        for m in self._compiled.finditer(s):
            yield (m.start(), m.end())


PatternLike = Union[str, Callable[[str], bool], SysRegex, Invert, "_std_re.Pattern", "_re.Pattern"]


def _regex_find_matches(find_iter, s: str) -> List[Tuple[Offsets, bool]]:
    if not s:
        return [((0, 0), False)]
    out: List[Tuple[Offsets, bool]] = []
    prev = 0
    for start, end in find_iter:
        if prev != start:
            out.append(((prev, start), False))
        out.append(((start, end), True))
        prev = end
    if prev != len(s):
        out.append(((prev, len(s)), False))
    return out


def find_matches(pattern: PatternLike, s: str) -> List[Tuple[Offsets, bool]]:
    if isinstance(pattern, Invert):
        return [(off, not m) for off, m in find_matches(pattern.pattern, s)]

    if isinstance(pattern, str):
        if not pattern:
            # empty pattern matches nothing
            return [((0, len(s)), False)]
        return _regex_find_matches(
            ((m.start(), m.end()) for m in _re.finditer(_re.escape(pattern), s)), s
        )

    if isinstance(pattern, SysRegex):
        return _regex_find_matches(pattern.find_iter(s), s)

    if hasattr(pattern, "finditer"):  # compiled re/regex pattern
        return _regex_find_matches(
            ((m.start(), m.end()) for m in pattern.finditer(s)), s
        )

    if callable(pattern):
        if not s:
            return [((0, 0), False)]
        out: List[Tuple[Offsets, bool]] = []
        last_offset = 0
        for i, c in enumerate(s):
            if pattern(c):
                if last_offset < i:
                    out.append(((last_offset, i), False))
                out.append(((i, i + 1), True))
                last_offset = i + 1
        if len(s) > last_offset:
            out.append(((last_offset, len(s)), False))
        return out

    raise TypeError(f"Unsupported pattern type: {type(pattern)}")
