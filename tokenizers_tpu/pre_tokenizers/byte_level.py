"""ByteLevel: GPT-2 byte-level pre-tokenizer / decoder / post-processor.

Reference `tokenizers/src/pre_tokenizers/byte_level.rs`: optional prefix
space, GPT-2 split regex (with lookahead), byte -> printable-unicode table,
lossy-UTF8 decoding, and offset trimming as a post-processor.
"""

from __future__ import annotations

from typing import Dict, List

from ..normalized import ISOLATED, _is_whitespace
from ..pattern import SysRegex
from ..pretokenized import PreTokenizedString
from . import PreTokenizer


def bytes_char() -> Dict[int, str]:
    """GPT-2 byte -> unicode printable char table
    (reference `byte_level.rs:15-39`)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


BYTES_CHAR: Dict[int, str] = bytes_char()
CHAR_BYTES: Dict[str, int] = {c: b for b, c in BYTES_CHAR.items()}

# GPT-2 split regex (reference byte_level.rs:43-46); needs lookahead
GPT2_SPLIT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
_GPT2_RE = SysRegex(GPT2_SPLIT_PATTERN)


class ByteLevel(PreTokenizer):
    def __init__(
        self,
        add_prefix_space: bool = True,
        trim_offsets: bool = True,
        use_regex: bool = True,
    ):
        self.add_prefix_space = add_prefix_space
        self.trim_offsets = trim_offsets
        self.use_regex = use_regex

    @staticmethod
    def alphabet():
        return set(BYTES_CHAR.values())

    # ------------------------------------------------------------ pretokenizer

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        def split_fn(i, normalized):
            if self.add_prefix_space and not normalized.get().startswith(" "):
                normalized.prepend(" ")
            if self.use_regex:
                return normalized.split(_GPT2_RE, ISOLATED)
            return [normalized]

        pretokenized.split(split_fn)

        def normalize_fn(normalized):
            transformations = []
            for c in normalized.get():
                bs = c.encode("utf-8")
                for k, b in enumerate(bs):
                    transformations.append((BYTES_CHAR[b], 1 if k > 0 else 0))
            normalized.transform(transformations, 0)

        pretokenized.normalize(normalize_fn)

    # ---------------------------------------------------------------- decoder

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out_bytes = bytearray()
        for t in tokens:
            bs = []
            ok = True
            for c in t:
                b = CHAR_BYTES.get(c)
                if b is None:
                    ok = False
                    break
                bs.append(b)
            if ok:
                out_bytes.extend(bs)
            else:
                out_bytes.extend(t.encode("utf-8"))
        return [out_bytes.decode("utf-8", errors="replace")]

    # ---------------------------------------------------------- postprocessor

    def added_tokens(self, is_pair: bool) -> int:
        return 0

    def process_encodings(self, encodings, add_special_tokens: bool):
        if self.trim_offsets:
            for encoding in encodings:
                process_offsets(encoding, self.add_prefix_space)
                for overflow in encoding.overflowing:
                    process_offsets(overflow, self.add_prefix_space)
        for i, encoding in enumerate(encodings):
            encoding.set_sequence_id(i)
        return encodings


_SPACE_CHAR = BYTES_CHAR[ord(" ")]


def process_offsets(encoding, add_prefix_space: bool) -> None:
    """Trim whitespace from token offsets (reference `byte_level.rs:202-234`)."""
    for i in range(len(encoding.ids)):
        token = encoding.tokens[i]
        start, end = encoding.offsets[i]
        leading = 0
        for c in token:
            if c == _SPACE_CHAR or _is_whitespace(c):
                leading += 1
            else:
                break
        trailing = 0
        for c in reversed(token):
            if c == _SPACE_CHAR or _is_whitespace(c):
                trailing += 1
            else:
                break
        if leading > 0 or trailing > 0:
            if leading > 0:
                is_first = i == 0 or start == 0
                if is_first and add_prefix_space and leading == 1:
                    leading = 0
                start = min(start + leading, end)
            if trailing > 0 and end >= trailing:
                end = max(end - trailing, start)
            encoding.offsets[i] = (start, end)
