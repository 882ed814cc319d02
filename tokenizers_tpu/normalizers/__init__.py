"""Normalizers: alignment-preserving string normalization components.

Each normalizer implements `normalize(NormalizedString)` and composes via
`Sequence` (reference `tokenizers/src/normalizers/`). Device-side LUT
equivalents for the hot configurations live in `tokenizers_tpu.ops.normalize`.
"""

from __future__ import annotations

import unicodedata
from typing import List, Optional

from ..normalized import NormalizedString
from ..pattern import SysRegex


class Normalizer:
    def normalize(self, normalized: NormalizedString) -> None:
        raise NotImplementedError

    def normalize_str(self, sequence: str) -> str:
        n = NormalizedString(sequence)
        self.normalize(n)
        return n.get()

    @staticmethod
    def custom(obj) -> "CustomNormalizer":
        """Wrap a user object with a `normalize(NormalizedString)` method as
        a pipeline normalizer (reference `bindings/python/src/normalizers.rs:
        146,634-679`).  Custom components are host-only (never compiled to a
        device engine) and non-serializable (`Tokenizer.save` fails)."""
        return CustomNormalizer(obj)


class CustomNormalizer(Normalizer):
    def __init__(self, obj):
        if not callable(getattr(obj, "normalize", None)):
            raise TypeError(
                "custom normalizer must have a normalize(NormalizedString) method"
            )
        self.obj = obj

    def normalize(self, normalized: NormalizedString) -> None:
        self.obj.normalize(normalized)


class Sequence(Normalizer):
    """Chain normalizers (reference `normalizers/utils.rs:11`)."""

    def __init__(self, normalizers: List[Normalizer]):
        self.normalizers = list(normalizers)

    def normalize(self, normalized: NormalizedString) -> None:
        for n in self.normalizers:
            n.normalize(normalized)

    def __getitem__(self, i):
        return self.normalizers[i]

    def __len__(self):
        return len(self.normalizers)


class Lowercase(Normalizer):
    def normalize(self, normalized: NormalizedString) -> None:
        normalized.lowercase()


class NFD(Normalizer):
    def normalize(self, normalized: NormalizedString) -> None:
        normalized.nfd()


class NFKD(Normalizer):
    def normalize(self, normalized: NormalizedString) -> None:
        normalized.nfkd()


class NFC(Normalizer):
    def normalize(self, normalized: NormalizedString) -> None:
        normalized.nfc()


class NFKC(Normalizer):
    def normalize(self, normalized: NormalizedString) -> None:
        normalized.nfkc()


class Nmt(Normalizer):
    """NMT char filtering / whitespace mapping
    (reference `normalizers/unicode.rs:44-77`)."""

    _FILTERED = frozenset(
        list(range(0x0001, 0x0009))
        + [0x000B]
        + list(range(0x000E, 0x0020))
        + [0x007F, 0x008F, 0x009F]
    )
    _TO_SPACE = frozenset(
        [0x0009, 0x000A, 0x000C, 0x000D, 0x1680]
        + list(range(0x200B, 0x2010))
        + [0x2028, 0x2029, 0x2581, 0xFEFF, 0xFFFD]
    )

    def normalize(self, normalized: NormalizedString) -> None:
        normalized.filter(lambda c: ord(c) not in self._FILTERED)
        normalized.map(lambda c: " " if ord(c) in self._TO_SPACE else c)


class Strip(Normalizer):
    def __init__(self, left: bool = True, right: bool = True):
        self.strip_left = left
        self.strip_right = right

    def normalize(self, normalized: NormalizedString) -> None:
        if self.strip_left and self.strip_right:
            normalized.strip()
        else:
            if self.strip_left:
                normalized.lstrip()
            if self.strip_right:
                normalized.rstrip()


class StripAccents(Normalizer):
    """Removes combining marks (category M*) without applying NFD
    (reference `normalizers/strip.rs:48`)."""

    def normalize(self, normalized: NormalizedString) -> None:
        normalized.filter(lambda c: not unicodedata.category(c).startswith("M"))


class Prepend(Normalizer):
    def __init__(self, prepend: str):
        self.prepend = prepend

    def normalize(self, normalized: NormalizedString) -> None:
        if not normalized.is_empty():
            normalized.prepend(self.prepend)


class Replace(Normalizer):
    """Pattern -> content replacement (reference `normalizers/replace.rs`).
    `pattern` is a literal string or a `SysRegex`/("Regex", str) marker."""

    def __init__(self, pattern, content: str):
        if isinstance(pattern, tuple) and len(pattern) == 2 and pattern[0] == "Regex":
            self.pattern_kind = "Regex"
            self.pattern_str = pattern[1]
            self._pattern = SysRegex(pattern[1])
        else:
            self.pattern_kind = "String"
            self.pattern_str = pattern
            self._pattern = pattern
        self.content = content

    def normalize(self, normalized: NormalizedString) -> None:
        normalized.replace(self._pattern, self.content)


def _is_bert_whitespace(c: str) -> bool:
    from ..normalized import _is_whitespace

    return c in "\t\n\r" or _is_whitespace(c)


def _is_bert_control(c: str) -> bool:
    if c in "\t\n\r":
        return False
    return unicodedata.category(c).startswith("C")


def is_chinese_char(cp: int) -> bool:
    """CJK Unified Ideographs blocks (reference `normalizers/bert.rs:37-48`)."""
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B920 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


class BertNormalizer(Normalizer):
    """clean_text + handle_chinese_chars + strip_accents + lowercase
    (reference `normalizers/bert.rs:53-137`)."""

    def __init__(
        self,
        clean_text: bool = True,
        handle_chinese_chars: bool = True,
        strip_accents: Optional[bool] = None,
        lowercase: bool = True,
    ):
        self.clean_text = clean_text
        self.handle_chinese_chars = handle_chinese_chars
        self.strip_accents = strip_accents
        self.lowercase = lowercase

    def normalize(self, normalized: NormalizedString) -> None:
        if self.clean_text:
            normalized.filter(
                lambda c: not (
                    ord(c) == 0 or ord(c) == 0xFFFD or _is_bert_control(c)
                )
            )
            normalized.map(lambda c: " " if _is_bert_whitespace(c) else c)
        if self.handle_chinese_chars:
            new_chars = []
            for c in normalized.get():
                if is_chinese_char(ord(c)):
                    new_chars.extend([(" ", 0), (c, 1), (" ", 1)])
                else:
                    new_chars.append((c, 0))
            normalized.transform(new_chars, 0)
        strip_accents = (
            self.strip_accents if self.strip_accents is not None else self.lowercase
        )
        if strip_accents:
            normalized.nfd()
            normalized.filter(lambda c: unicodedata.category(c) != "Mn")
        if self.lowercase:
            normalized.lowercase()


class ByteLevel(Normalizer):
    """byte -> printable-unicode remap as a normalizer
    (reference `normalizers/byte_level.rs:9`)."""

    def normalize(self, normalized: NormalizedString) -> None:
        from ..pre_tokenizers.byte_level import BYTES_CHAR

        if normalized.is_empty():
            return
        transformations = []
        for c in normalized.get():
            bs = c.encode("utf-8")
            for i, b in enumerate(bs):
                transformations.append((BYTES_CHAR[b], 1 if i > 0 else 0))
        normalized.transform(transformations, 0)

    @staticmethod
    def alphabet():
        from ..pre_tokenizers.byte_level import BYTES_CHAR

        return set(BYTES_CHAR.values())


from .precompiled import Precompiled  # noqa: E402

__all__ = [
    "Normalizer",
    "Sequence",
    "Lowercase",
    "NFD",
    "NFKD",
    "NFC",
    "NFKC",
    "Nmt",
    "Strip",
    "StripAccents",
    "Prepend",
    "Replace",
    "BertNormalizer",
    "ByteLevel",
    "Precompiled",
    "is_chinese_char",
]
