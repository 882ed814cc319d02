"""Precompiled: SentencePiece precompiled charsmap normalizer.

Replaces the reference's `spm_precompiled` crate
(`tokenizers/src/normalizers/precompiled.rs:33-75`): a darts-clone
double-array trie over normalization rules plus a '\\0'-separated blob of
normalized replacements. Faithful to the reference's quirky matching: whole
graphemes under 6 bytes are looked up first, then individual chars; the
replacement uses the *longest* trie prefix hit of the queried chunk, and the
content chars are all inserted with `transform` semantics.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np
import regex as _re

from ..normalized import NormalizedString
from . import Normalizer

_GRAPHEME_RE = _re.compile(r"\X")


class DoubleArray:
    """darts-clone double-array trie reader."""

    __slots__ = ("units",)

    def __init__(self, units: np.ndarray):
        self.units = units

    def common_prefix_search(self, key: bytes) -> List[int]:
        units = self.units
        results: List[int] = []
        unit = int(units[0])
        node_pos = (unit >> 10) << ((unit & 0x200) >> 6)
        for c in key:
            node_pos ^= c
            unit = int(units[node_pos])
            if (unit & 0x800000FF) != c:
                return results
            node_pos ^= (unit >> 10) << ((unit & 0x200) >> 6)
            if (unit >> 8) & 1:
                results.append(int(units[node_pos]) & 0x7FFFFFFF)
        return results


class Precompiled(Normalizer):
    def __init__(self, precompiled_charsmap: bytes):
        self.precompiled_charsmap = bytes(precompiled_charsmap)
        if len(precompiled_charsmap) < 4:
            raise ValueError("Precompiled charsmap too short")
        (trie_size,) = struct.unpack("<I", self.precompiled_charsmap[:4])
        left = self.precompiled_charsmap[4:]
        trie_blob = left[:trie_size]
        self.normalized_blob = left[trie_size:]
        self.trie = DoubleArray(np.frombuffer(trie_blob, dtype="<u4"))

    def transform(self, chunk: str) -> Optional[str]:
        results = self.trie.common_prefix_search(chunk.encode("utf-8"))
        if not results:
            return None
        index = results[-1]  # longest prefix hit
        end = self.normalized_blob.find(b"\x00", index)
        if end == -1:
            end = len(self.normalized_blob)
        return self.normalized_blob[index:end].decode("utf-8")

    def normalize(self, normalized: NormalizedString) -> None:
        transformations: List[Tuple[str, int]] = []
        modified = False
        for m in _GRAPHEME_RE.finditer(normalized.get()):
            grapheme = m.group()
            if len(grapheme.encode("utf-8")) < 6:
                norm = self.transform(grapheme)
                if norm is not None:
                    modified = True
                    _replace(transformations, grapheme, norm)
                    continue
            for c in grapheme:
                part = c
                norm = self.transform(part)
                if norm is not None:
                    modified = True
                    _replace(transformations, part, norm)
                else:
                    transformations.append((c, 0))
        if modified:
            normalized.transform(transformations, 0)


def _replace(transformations: List[Tuple[str, int]], old_part: str, new_part: str) -> None:
    """(reference `normalizers/precompiled.rs:6-31`)"""
    old_count = len(old_part)
    new_count = len(new_part)
    diff = new_count - old_count
    start = len(transformations)
    transformations.extend((c, 0) for c in new_part)
    if diff > 0:
        for i in range(len(transformations) - diff, len(transformations)):
            c, _ = transformations[i]
            transformations[i] = (c, 1)
    elif diff < 0:
        if transformations:
            c, cs = transformations[-1]
            transformations[-1] = (c, cs + diff)
        # NB: if new_part is empty and there are no prior transformations the
        # reference silently drops the removal; we mirror that.
    _ = start
