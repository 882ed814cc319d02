"""WordLevelEngine: the compiled TPU path for WordLevel pipelines.

Covers `WordLevel` + {Whitespace, WhitespaceSplit, BertPreTokenizer} with
any host normalizer (applied in `_prepare` — WordLevel is one token per
word, so the fast path carries ids only; offset requests fall back to the
host pipeline).  Reference behavior: exact token->id lookup with
`unk_token` fallback (`models/wordlevel/mod.rs:162-186`).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from .engine_base import DeviceEngineBase
from .merge_table import CuckooMergeTable
from .wordlevel_encode import wordlevel_class_tables, wordlevel_program

H1_MULT = np.uint32(0x01000193)
H2_MULT = np.uint32(0x0000C597)


def _roll(data: bytes, mult: np.uint32) -> int:
    h = np.uint32(0)
    with np.errstate(over="ignore"):
        for byte in data:
            h = h * mult + np.uint32(byte + 1)
    return int(np.int32(h))


class WordLevelEngine(DeviceEngineBase):
    supports_offsets = True
    offsets_space = "normalized_bytes"

    def __init__(self, tokenizer, vtab, unk_id):
        self.tokenizer = tokenizer
        self.unk_id = np.int32(unk_id)
        kind = self._pretok_kind(tokenizer.pre_tokenizer)
        s1, s2 = wordlevel_class_tables(kind)
        self.d_cls_s1 = jnp.asarray(s1)
        self.d_cls_s2 = jnp.asarray(s2)
        self.d_vkey_a = jnp.asarray(vtab.key_a)
        self.d_vkey_b = jnp.asarray(vtab.key_b)
        self.d_vlen = jnp.asarray(vtab.rank)
        self.d_vid = jnp.asarray(vtab.new_id)
        self.vseed = jnp.int32(vtab.seed)

    # ------------------------------------------------------------------ build

    @staticmethod
    def _pretok_kind(pt) -> Optional[str]:
        from ..pre_tokenizers import (
            BertPreTokenizer,
            Whitespace,
            WhitespaceSplit,
        )

        if isinstance(pt, BertPreTokenizer):
            return "bert"
        if isinstance(pt, Whitespace):
            return "whitespace"
        if isinstance(pt, WhitespaceSplit):
            return "whitespace_split"
        return None

    @staticmethod
    def try_build(tokenizer) -> Optional["WordLevelEngine"]:
        from ..models.wordlevel import WordLevel

        m = tokenizer.model
        if not isinstance(m, WordLevel):
            return None
        if m.unk_token not in m.vocab:
            return None  # host path raises MissingUnkToken faithfully
        if WordLevelEngine._pretok_kind(tokenizer.pre_tokenizer) is None:
            return None

        entries = {}
        key_bytes = {}
        for word, tid in m.vocab.items():
            bs = word.encode("utf-8")
            if not bs:
                continue
            key = (_roll(bs, H1_MULT), _roll(bs, H2_MULT))
            if key in entries and key_bytes[key] != bs:
                return None  # true hash collision: host path
            entries[key] = (len(bs), tid)
            key_bytes[key] = bs
        if not entries:
            return None
        vtab = CuckooMergeTable(entries)
        return WordLevelEngine(tokenizer, vtab, m.vocab[m.unk_token])

    # ----------------------------------------------------------------- encode

    def _prepare(self, s: str) -> bytes:
        nz = self.tokenizer.normalizer
        if nz is not None:
            s = nz.normalize_str(s)
        return s.encode("utf-8")

    def _needs_host(self, s: str, added) -> bool:
        if any(t in s for t in added):
            return True
        nz = self.tokenizer.normalizer
        if nz is not None and added:
            ns = nz.normalize_str(s)
            if any(t in ns for t in added):
                return True
        return False

    def _prepare_aligned(self, s: str):
        nz = self.tokenizer.normalizer
        if nz is None:
            return s.encode("utf-8"), None
        from ..normalized import NormalizedString

        ns = NormalizedString(s)
        nz.normalize(ns)
        return ns.get().encode("utf-8"), ns

    def _program(self, buf, lengths):
        return wordlevel_program(
            buf,
            lengths,
            self.d_cls_s1,
            self.d_cls_s2,
            self.d_vkey_a,
            self.d_vkey_b,
            self.d_vlen,
            self.d_vid,
            self.vseed,
            self.unk_id,
        )

    def _program_offsets(self, buf, lengths):
        return wordlevel_program(
            buf,
            lengths,
            self.d_cls_s1,
            self.d_cls_s2,
            self.d_vkey_a,
            self.d_vkey_b,
            self.d_vlen,
            self.d_vid,
            self.vseed,
            self.unk_id,
            with_offsets=True,
        )
