"""NormalizedString: alignment-tracking mutable string.

The offset-tracking substrate of the pipeline (reference
`tokenizers/src/tokenizer/normalizer.rs:105-117`): holds the `original` string,
the current `normalized` string, and per-normalized-byte alignments `(start,
end)` into the original string's bytes, plus `original_shift` when this is a
slice of a larger string.

All public ranges in this class are **byte offsets** (like the reference).
Helpers convert char indices <-> byte offsets for Python-side callers.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Sequence, Tuple

from .utils import unicode_norm as _un

# Split delimiter behaviors (reference normalizer.rs:82)
REMOVED = "removed"
ISOLATED = "isolated"
MERGED_WITH_PREVIOUS = "merged_with_previous"
MERGED_WITH_NEXT = "merged_with_next"
CONTIGUOUS = "contiguous"

# Unicode White_Space property (== Rust char::is_whitespace). NB: differs from
# Python str.isspace() which also includes 0x1C..0x1F.
_WHITESPACE_CPS = frozenset(
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)


def _is_whitespace(c: str) -> bool:
    return ord(c) in _WHITESPACE_CPS


def _utf8_len(c: str) -> int:
    cp = ord(c)
    if cp < 0x80:
        return 1
    if cp < 0x800:
        return 2
    if cp < 0x10000:
        return 3
    return 4


def char_to_byte_offsets(s: str) -> List[int]:
    """Byte offset of each char, plus a final entry == total byte length."""
    out = [0]
    pos = 0
    for c in s:
        pos += _utf8_len(c)
        out.append(pos)
    return out


class NormalizedString:
    __slots__ = ("original", "normalized", "alignments", "original_shift")

    def __init__(self, s: str = ""):
        self.original: str = s
        self.normalized: str = s
        alignments: List[Tuple[int, int]] = []
        b = 0
        for c in s:
            n = _utf8_len(c)
            alignments.extend([(b, b + n)] * n)
            b += n
        self.alignments: List[Tuple[int, int]] = alignments
        self.original_shift: int = 0

    @classmethod
    def _raw(cls, original, normalized, alignments, original_shift) -> "NormalizedString":
        obj = cls.__new__(cls)
        obj.original = original
        obj.normalized = normalized
        obj.alignments = alignments
        obj.original_shift = original_shift
        return obj

    # ------------------------------------------------------------------ basics

    def get(self) -> str:
        return self.normalized

    def get_original(self) -> str:
        return self.original

    def __len__(self) -> int:
        """Byte length of the normalized string."""
        return len(self.alignments)

    def len_original(self) -> int:
        return len(self.original.encode("utf-8"))

    def is_empty(self) -> bool:
        return len(self.alignments) == 0

    def offsets_original(self) -> Tuple[int, int]:
        return (self.original_shift, self.original_shift + self.len_original())

    def __eq__(self, other):
        if not isinstance(other, NormalizedString):
            return NotImplemented
        return (
            self.original == other.original
            and self.normalized == other.normalized
            and self.alignments == other.alignments
            and self.original_shift == other.original_shift
        )

    def __repr__(self):
        return (
            f"NormalizedString(original={self.original!r}, "
            f"normalized={self.normalized!r})"
        )

    # ------------------------------------------------------------ conversions

    def convert_offsets(
        self, start: int, end: int, referential: str = "original"
    ) -> Optional[Tuple[int, int]]:
        """Convert a byte range between referentials
        (reference `normalizer.rs:156-215`)."""
        len_original = self.len_original()
        len_normalized = len(self.alignments)
        original = referential == "original"
        target_len = len_original if original else len_normalized
        if end is None:
            end = target_len
        if start == end:
            return (start, end)
        if start > end:
            return None
        if original and len_original == 0 and (start, end) == (0, 0):
            return (0, len_normalized)
        if not original and len_normalized == 0 and (start, end) == (0, 0):
            return (0, len_original)

        if original:
            s = None
            e = None
            for i, (a0, a1) in enumerate(self.alignments):
                if end < a1:
                    break
                if s is None and start <= a0:
                    if a0 != a1:
                        s = i
                if end >= a1:
                    e = i + 1
            if s is not None and e is None:
                return (s, s)
            if s is None and e is not None:
                return (e, e)
            if s is not None and e is not None:
                return (s, e)
            return None
        else:
            sub = self.alignments[start:end]
            if not sub:
                return None
            return (sub[0][0], sub[-1][1])

    def get_range(
        self, start: int = 0, end: Optional[int] = None, referential: str = "normalized"
    ) -> Optional[str]:
        nb = self.normalized.encode("utf-8")
        if referential == "original":
            conv = self.convert_offsets(start, end if end is not None else self.len_original(), "original")
            if conv is None:
                return None
            start, end = conv
        if end is None:
            end = len(nb)
        if start > len(nb) or end > len(nb):
            return None
        try:
            return nb[start:end].decode("utf-8")
        except UnicodeDecodeError:
            return None

    def get_range_original(
        self, start: int = 0, end: Optional[int] = None, referential: str = "normalized"
    ) -> Optional[str]:
        ob = self.original.encode("utf-8")
        if referential == "normalized":
            conv = self.convert_offsets(start, end if end is not None else len(self.alignments), "normalized")
            if conv is None:
                return None
            start, end = conv
        if end is None:
            end = len(ob)
        if start > len(ob) or end > len(ob):
            return None
        try:
            return ob[start:end].decode("utf-8")
        except UnicodeDecodeError:
            return None

    # ------------------------------------------------------------- transforms

    def transform_range(
        self,
        start: int,
        end: Optional[int],
        dest: Iterable[Tuple[str, int]],
        initial_offset: int = 0,
        referential: str = "normalized",
    ) -> None:
        """Core transform (reference `normalizer.rs:318-429`).

        `dest` yields `(char, change)` with change: 1 = inserted char, 0 = char
        replacing the next existing one, -N = replacing + removing N more.
        """
        if referential == "original":
            conv = self.convert_offsets(
                start, end if end is not None else self.len_original(), "original"
            )
            if conv is None:
                return
            start, end = conv
        if end is None:
            end = len(self.alignments)

        nb = self.normalized.encode("utf-8")
        seg_chars = nb[start:end].decode("utf-8")
        replaced_iter = iter(seg_chars)
        initial_removed = 0
        for _ in range(initial_offset):
            c = next(replaced_iter, None)
            if c is None:
                break
            initial_removed += _utf8_len(c)

        offset = initial_removed + start
        new_alignments: List[Tuple[int, int]] = []
        out_chars: List[str] = []
        for c, changes in dest:
            idx = offset
            if changes > 0:
                align = self.alignments[idx - 1] if idx >= 1 else (0, 0)
            else:
                align = self.alignments[idx]
            replaced_size = 0
            if changes <= 0:
                rc = next(replaced_iter, None)
                if rc is not None:
                    replaced_size = _utf8_len(rc)
            removed_bytes = 0
            if changes < 0:
                for _ in range(-changes):
                    rc = next(replaced_iter, None)
                    if rc is None:
                        break
                    removed_bytes += _utf8_len(rc)
            offset += replaced_size + removed_bytes
            clen = _utf8_len(c)
            new_alignments.extend([align] * clen)
            out_chars.append(c)

        self.alignments[start:end] = new_alignments
        new_b = nb[:start] + "".join(out_chars).encode("utf-8") + nb[end:]
        self.normalized = new_b.decode("utf-8")

    def transform(self, dest: Iterable[Tuple[str, int]], initial_offset: int = 0) -> None:
        self.transform_range(0, None, dest, initial_offset)

    # ------------------------------------------------------------ normalizers

    def nfd(self) -> "NormalizedString":
        self.transform(_un.nfd_transform(self.normalized), 0)
        return self

    def nfkd(self) -> "NormalizedString":
        self.transform(_un.nfkd_transform(self.normalized), 0)
        return self

    def nfc(self) -> "NormalizedString":
        dest, initial = _un.nfc_transform(self.normalized)
        self.transform(dest, initial)
        return self

    def nfkc(self) -> "NormalizedString":
        dest, initial = _un.nfkc_transform(self.normalized)
        self.transform(dest, initial)
        return self

    def filter(self, keep: Callable[[str], bool]) -> "NormalizedString":
        removed = 0
        removed_start = 0
        transforms: List[Tuple[str, int]] = []
        last_c: Optional[str] = None
        for c in self.normalized:
            if keep(c):
                if last_c is not None:
                    transforms.append((last_c, -removed))
                else:
                    removed_start = removed
                last_c = c
                removed = 0
            else:
                removed += 1
        if last_c is not None:
            transforms.append((last_c, -removed))
        self.transform(transforms, removed_start)
        return self

    def prepend(self, s: str) -> "NormalizedString":
        if not self.normalized:
            return self
        first = self.normalized[0]
        dest = [(c, 0 if i == 0 else 1) for i, c in enumerate(s)] + [(first, 1)]
        self.transform_range(0, _utf8_len(first), dest, 0)
        return self

    def append(self, s: str) -> "NormalizedString":
        if self.normalized:
            last = self.normalized[-1]
            start = len(self.alignments) - _utf8_len(last)
            dest = [(last, 0)] + [(c, 1) for c in s]
            self.transform_range(start, None, dest, 0)
        else:
            self.transform_range(0, None, [(c, 1) for c in s], 0)
        return self

    def map(self, fn: Callable[[str], str]) -> "NormalizedString":
        self.transform([(fn(c), 0) for c in self.normalized], 0)
        return self

    def for_each(self, fn: Callable[[str], None]) -> "NormalizedString":
        for c in self.normalized:
            fn(c)
        return self

    def lowercase(self) -> "NormalizedString":
        new_chars: List[Tuple[str, int]] = []
        for c in self.normalized:
            for i, lc in enumerate(c.lower()):
                new_chars.append((lc, 1 if i > 0 else 0))
        self.transform(new_chars, 0)
        return self

    def uppercase(self) -> "NormalizedString":
        new_chars: List[Tuple[str, int]] = []
        for c in self.normalized:
            for i, uc in enumerate(c.upper()):
                new_chars.append((uc, 1 if i > 0 else 0))
        self.transform(new_chars, 0)
        return self

    def clear(self) -> "NormalizedString":
        n_chars = len(self.normalized)
        self.transform([], n_chars)
        return self

    def replace(self, pattern, content: str) -> "NormalizedString":
        """Replace all matches of `pattern` by `content`
        (reference `normalizer.rs:571`)."""
        from .pattern import find_matches

        matches = find_matches(pattern, self.normalized)
        # byte offsets of char positions
        cb = char_to_byte_offsets(self.normalized)
        dest = [(c, 1) for c in content]
        # process in reverse so byte offsets stay valid; equivalent to the
        # reference's forward pass: content chars are all insertions that
        # inherit the alignment of the last matched byte
        # (normalizer.rs:586-594 commented equivalence).
        for (cstart, cend), is_match in reversed(matches):
            if not is_match:
                continue
            self.transform_range(cb[cstart], cb[cend], dest, cend - cstart)
        return self

    # ------------------------------------------------------------------ strip

    def lstrip(self) -> "NormalizedString":
        return self._lrstrip(left=True, right=False)

    def rstrip(self) -> "NormalizedString":
        return self._lrstrip(left=False, right=True)

    def strip(self) -> "NormalizedString":
        return self._lrstrip(left=True, right=True)

    def _lrstrip(self, left: bool, right: bool) -> "NormalizedString":
        chars = self.normalized
        n = len(chars)
        lcount = 0
        if left:
            while lcount < n and _is_whitespace(chars[lcount]):
                lcount += 1
        rcount = 0
        if right:
            while rcount < n - lcount and _is_whitespace(chars[n - 1 - rcount]):
                rcount += 1
        if rcount:
            bstart = sum(_utf8_len(c) for c in chars[: n - rcount])
            self.transform_range(bstart, None, [], rcount)
        if lcount:
            bend = sum(_utf8_len(c) for c in chars[:lcount])
            self.transform_range(0, bend, [], lcount)
        return self

    # ------------------------------------------------------------------ slice

    def slice(
        self, start: int, end: Optional[int], referential: str = "normalized"
    ) -> Optional["NormalizedString"]:
        """Slice on byte offsets at char boundaries
        (reference `normalizer.rs:272`)."""
        nb = self.normalized.encode("utf-8")
        ob = self.original.encode("utf-8")
        if referential == "normalized":
            if end is None:
                end = len(nb)
            if not _is_char_boundary(nb, start) or not _is_char_boundary(nb, end):
                return None
            n_range = (start, end)
            o_range = self.convert_offsets(start, end, "normalized")
            if o_range is None:
                return None
        else:
            if end is None:
                end = len(ob)
            if not _is_char_boundary(ob, start) or not _is_char_boundary(ob, end):
                return None
            o_range = (start, end)
            n_range = self.convert_offsets(start, end, "original")
            if n_range is None:
                return None
        n_shift = o_range[0]
        new_alignments = [
            (max(a0 - n_shift, 0), max(a1 - n_shift, 0))
            for (a0, a1) in self.alignments[n_range[0] : n_range[1]]
        ]
        return NormalizedString._raw(
            ob[o_range[0] : o_range[1]].decode("utf-8", errors="replace"),
            nb[n_range[0] : n_range[1]].decode("utf-8", errors="replace"),
            new_alignments,
            self.original_shift + o_range[0],
        )

    # ------------------------------------------------------------------ split

    def split(self, pattern, behavior: str) -> List["NormalizedString"]:
        """Split on a pattern with the given delimiter behavior
        (reference `normalizer.rs:695` + `SplitDelimiterBehavior`)."""
        from .pattern import find_matches

        matches = find_matches(pattern, self.normalized)

        # Apply behavior: turn (range, is_match) into (range, should_remove)
        if behavior == ISOLATED:
            parts = [(rng, False) for rng, _ in matches]
        elif behavior == REMOVED:
            parts = [(rng, is_m) for rng, is_m in matches]
        elif behavior == MERGED_WITH_PREVIOUS:
            parts = []
            previous_match = False
            for rng, is_m in matches:
                if is_m and parts and not previous_match:
                    prev_rng, _ = parts[-1]
                    parts[-1] = ((prev_rng[0], rng[1]), False)
                else:
                    parts.append((rng, False))
                previous_match = is_m
        elif behavior == MERGED_WITH_NEXT:
            parts = []
            previous_match = False
            for rng, is_m in reversed(matches):
                if is_m and parts and not previous_match:
                    nxt_rng, _ = parts[-1]
                    parts[-1] = ((rng[0], nxt_rng[1]), False)
                else:
                    parts.append((rng, False))
                previous_match = is_m
            parts.reverse()
        elif behavior == CONTIGUOUS:
            parts = []
            previous_match = None
            for rng, is_m in matches:
                if parts and is_m == previous_match:
                    prev_rng, _ = parts[-1]
                    parts[-1] = ((prev_rng[0], rng[1]), False)
                else:
                    parts.append((rng, False))
                previous_match = is_m
        else:
            raise ValueError(f"Unknown split behavior: {behavior}")

        cb = char_to_byte_offsets(self.normalized)
        out: List[NormalizedString] = []
        for (cstart, cend), should_remove in parts:
            if should_remove or cstart == cend:
                continue
            sliced = self.slice(cb[cstart], cb[cend], "normalized")
            if sliced is not None:
                out.append(sliced)
        return out


def _is_char_boundary(b: bytes, pos: int) -> bool:
    if pos == 0 or pos == len(b):
        return True
    if pos > len(b):
        return False
    return (b[pos] & 0xC0) != 0x80
