"""PreTokenizedString: drives split -> normalize -> tokenize -> Encoding.

Mirrors reference `tokenizers/src/tokenizer/pre_tokenizer.rs` behavior: a list
of `Split`s (each a NormalizedString slice of one original string, with
optional attached tokens), plus conversion into an `Encoding` with offsets
re-mapped to the original string (byte or char referential).
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Tuple

from .encoding import Encoding
from .normalized import NormalizedString

# offset types
BYTE = "byte"
CHAR = "char"
NONE = "none"

# offset referentials (get_splits)
ORIGINAL = "original"
NORMALIZED = "normalized"


class Token:
    __slots__ = ("id", "value", "offsets")

    def __init__(self, id: int, value: str, offsets: Tuple[int, int]):
        self.id = id
        self.value = value
        self.offsets = offsets

    def __repr__(self):
        return f"Token(id={self.id}, value={self.value!r}, offsets={self.offsets})"

    def __eq__(self, other):
        return (
            isinstance(other, Token)
            and self.id == other.id
            and self.value == other.value
            and self.offsets == other.offsets
        )


class Split:
    __slots__ = ("normalized", "tokens")

    def __init__(self, normalized: NormalizedString, tokens: Optional[List[Token]] = None):
        self.normalized = normalized
        self.tokens = tokens


class PreTokenizedString:
    __slots__ = ("original", "splits")

    def __init__(self, s):
        if isinstance(s, NormalizedString):
            normalized = s
        else:
            normalized = NormalizedString(s)
        self.original: str = normalized.get_original()
        self.splits: List[Split] = [Split(normalized)]

    def split(
        self,
        split_fn: Callable[[int, NormalizedString], Iterable],
    ) -> None:
        """Apply `split_fn(idx, normalized) -> iterable of NormalizedString or
        (NormalizedString, Optional[List[Token]])` to every untokenized split."""
        new_splits: List[Split] = []
        for i, original_split in enumerate(self.splits):
            if original_split.tokens is not None:
                new_splits.append(original_split)
                continue
            for item in split_fn(i, original_split.normalized):
                if isinstance(item, Split):
                    split = item
                elif isinstance(item, tuple):
                    split = Split(item[0], item[1])
                else:
                    split = Split(item)
                if split.normalized.is_empty():
                    continue
                new_splits.append(split)
        self.splits = new_splits

    def normalize(self, normalize_fn: Callable[[NormalizedString], None]) -> None:
        for split in self.splits:
            if split.tokens is None:
                normalize_fn(split.normalized)

    def tokenize(self, tokenize_fn: Callable[[NormalizedString], List[Token]]) -> None:
        for split in self.splits:
            if split.tokens is None:
                split.tokens = tokenize_fn(split.normalized)

    def into_encoding(
        self,
        word_idx: Optional[int] = None,
        type_id: int = 0,
        offset_type: str = BYTE,
    ) -> Encoding:
        if not self.splits:
            return Encoding()
        if any(split.tokens is None for split in self.splits):
            raise RuntimeError(
                "Split has not been tokenized, call `PreTokenizedString.tokenize` first"
            )

        ids: List[int] = []
        tokens: List[str] = []
        offsets: List[Tuple[int, int]] = []
        words: List[Optional[int]] = []
        type_ids: List[int] = []

        if offset_type == NONE:
            for split in self.splits:
                for token in split.tokens:
                    ids.append(token.id)
                    tokens.append("")
                    offsets.append((0, 0))
                    words.append(None)
                    type_ids.append(0)
            return Encoding(
                ids=ids, type_ids=type_ids, tokens=tokens, words=words, offsets=offsets
            )

        converter = (
            BytesToCharOffsetConverter(self.original) if offset_type == CHAR else None
        )

        for idx, split in enumerate(self.splits):
            normalized = split.normalized
            split_offsets = normalized.offsets_original()
            for token in split.tokens:
                conv = normalized.convert_offsets(
                    token.offsets[0], token.offsets[1], "normalized"
                )
                if conv is not None:
                    off = (split_offsets[0] + conv[0], split_offsets[0] + conv[1])
                else:
                    off = token.offsets
                if converter is not None:
                    off = converter.convert(off) or off
                ids.append(token.id)
                tokens.append(token.value)
                offsets.append(off)
                words.append(word_idx if word_idx is not None else idx)
                type_ids.append(type_id)

        return Encoding(
            ids=ids, type_ids=type_ids, tokens=tokens, words=words, offsets=offsets
        )

    def get_splits(
        self, offset_ref: str = ORIGINAL, offset_type: str = BYTE
    ) -> List[Tuple[str, Tuple[int, int], Optional[List[Token]]]]:
        converter = (
            BytesToCharOffsetConverter(self.original) if offset_type == CHAR else None
        )
        out = []
        offset = 0
        for split in self.splits:
            if offset_ref == ORIGINAL:
                offsets = split.normalized.offsets_original()
            else:
                n = len(split.normalized)
                offset += n
                offsets = (offset - n, offset)
            if converter is not None:
                offsets = converter.convert(offsets) or offsets
            out.append((split.normalized.get(), offsets, split.tokens))
        return out


class BytesToCharOffsetConverter:
    """Original-byte-offset -> char-offset map
    (reference `pre_tokenizer.rs:267`)."""

    __slots__ = ("map",)

    def __init__(self, sequence: str):
        m = {}
        b = 0
        for i, c in enumerate(sequence):
            n = len(c.encode("utf-8"))
            for k in range(n):
                m[b + k] = i
            b += n
        self.map = m

    def convert(self, offsets: Tuple[int, int]) -> Optional[Tuple[int, int]]:
        start = self.map.get(offsets[0])
        end = self.map.get(offsets[1])
        if start is not None and end is not None:
            return (start, end)
        if start is not None and end is None:
            last = self.map.get(offsets[1] - 1)
            if last is None:
                last = start + 1
            return (start, last + 1)
        return None
