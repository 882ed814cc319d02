"""Metaspace pre-tokenizer / decoder.

Reference `tokenizers/src/pre_tokenizers/metaspace.rs`: replace ' ' by the
meta char (default '▁'), prepend scheme First/Never/Always, split
MergedWithNext.
"""

from __future__ import annotations

from typing import List

from ..normalized import MERGED_WITH_NEXT
from ..pretokenized import PreTokenizedString
from . import PreTokenizer

PREPEND_FIRST = "first"
PREPEND_NEVER = "never"
PREPEND_ALWAYS = "always"


class Metaspace(PreTokenizer):
    def __init__(
        self,
        replacement: str = "▁",
        prepend_scheme: str = PREPEND_ALWAYS,
        split: bool = True,
    ):
        if len(replacement) != 1:
            raise ValueError("replacement must be a single char")
        if prepend_scheme not in (PREPEND_FIRST, PREPEND_NEVER, PREPEND_ALWAYS):
            raise ValueError(f"Invalid prepend_scheme: {prepend_scheme}")
        self.replacement = replacement
        self.prepend_scheme = prepend_scheme
        self.split = split

    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        rep = self.replacement

        def split_fn(i, normalized):
            normalized.replace(" ", rep)
            if self.prepend_scheme == PREPEND_ALWAYS:
                if not normalized.get().startswith(rep):
                    normalized.prepend(rep)
            elif self.prepend_scheme == PREPEND_FIRST:
                if (
                    not normalized.get().startswith(rep)
                    and normalized.offsets_original()[0] == 0
                ):
                    normalized.prepend(rep)
            if self.split:
                return normalized.split(rep, MERGED_WITH_NEXT)
            return [normalized]

        pretokenized.split(split_fn)

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out = []
        for i, token in enumerate(tokens):
            chars = []
            for c in token:
                if c == self.replacement:
                    if i == 0 and self.prepend_scheme != PREPEND_NEVER:
                        continue
                    chars.append(" ")
                else:
                    chars.append(c)
            out.append("".join(chars))
        return out
