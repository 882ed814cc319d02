"""CharBpeEngine: the compiled TPU path for char-level (non-byte-level)
BPE pipelines — the reference configurations the round-1 engine family
left to the host:

  * Whitespace / WhitespaceSplit / BertPreTokenizer + BPE (incl. the
    `CharBPETokenizer` recipe with `end_of_word_suffix="</w>"`,
    `bindings/python/py_src/tokenizers/implementations/char_level_bpe.py`)
  * Metaspace + BPE (`SentencePieceBPETokenizer`,
    `implementations/sentencepiece_bpe.py`), with the space->▁ replacement
    and prepend done on device
  * `continuing_subword_prefix` / `byte_fallback` / `fuse_unk` / unk-less
    variants (`models/bpe/model.rs:382-460`)

Any host normalizer applies in `_prepare` (string-level, before packing);
the device path is ids-only — offset requests fall back to the host
pipeline (`supports_offsets=False`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from .charbpe_encode import build_char_id_tables, charbpe_program
from .engine_base import DeviceEngineBase
from .merge_table import CuckooMergeTable, consume_mins
from .wordlevel_encode import wordlevel_class_tables


class CharBpeEngine(DeviceEngineBase):
    supports_offsets = True
    offsets_space = "normalized_bytes"

    def __init__(
        self,
        tokenizer,
        kind: str,
        id_s1: np.ndarray,
        id_s2: np.ndarray,
        fb256: Optional[np.ndarray],
        unk_id: int,
        table: CuckooMergeTable,
        mclr: np.ndarray,
        prepend: bool,
    ):
        m = tokenizer.model
        self.tokenizer = tokenizer
        self.kind = kind
        self.d_id_s1 = jnp.asarray(id_s1)
        self.d_id_s2 = jnp.asarray(id_s2)
        self.byte_fallback = fb256 is not None
        self.d_fb256 = jnp.asarray(
            fb256 if fb256 is not None else np.full(256, -1, np.int32)
        )
        self.has_unk = unk_id >= 0
        self.unk_id = jnp.int32(max(unk_id, 0))
        self.fuse_unk = bool(m.fuse_unk)
        self.prepend = prepend
        self.d_rows0 = jnp.asarray(table.rows8(0, mclr))
        self.d_rows1 = jnp.asarray(table.rows8(1, mclr))
        self.seed = jnp.int32(table.seed)
        self.d_mclr = jnp.asarray(mclr)
        self._cross_safe = None
        if kind in ("metaspace", "none"):
            self.d_cls_s1 = self.d_cls_s2 = None
        else:
            s1, s2 = wordlevel_class_tables(kind)
            self.d_cls_s1 = jnp.asarray(s1)
            self.d_cls_s2 = jnp.asarray(s2)

    # ------------------------------------------------------------------ build

    @staticmethod
    def try_build(tokenizer) -> Optional["CharBpeEngine"]:
        from ..models.bpe import BPE
        from ..pre_tokenizers import (
            BertPreTokenizer,
            Whitespace,
            WhitespaceSplit,
        )
        from ..pre_tokenizers.metaspace import Metaspace

        m = tokenizer.model
        if not isinstance(m, BPE):
            return None
        if m.dropout not in (None, 0.0):
            return None
        if m.ignore_merges:
            return None  # whole-word bypass: byte-level engine territory

        pt = tokenizer.pre_tokenizer
        prepend = True
        if isinstance(pt, Whitespace):
            kind = "whitespace"
        elif isinstance(pt, WhitespaceSplit):
            kind = "whitespace_split"
        elif isinstance(pt, BertPreTokenizer):
            kind = "bert"
        elif isinstance(pt, Metaspace):
            if pt.replacement != "▁" or not pt.split:
                return None
            # engine inputs carry no added tokens, so the whole string is
            # the first split: First == Always here
            prepend = pt.prepend_scheme in ("always", "first")
            kind = "metaspace"
        elif pt is None:
            # Llama-2-SPM shape: no pre-tokenizer, whole text = one
            # segment.  Requires complete byte fallback (seeding then
            # never fuses unk runs) and bounded piece lengths so merge
            # dead-gaps stay within the fill horizon.
            kind = "none"
        else:
            return None

        fb256 = None
        if m.byte_fallback:
            if m.continuing_subword_prefix or m.end_of_word_suffix:
                # the reference falls back on the *affixed* string's bytes
                # (model.rs:420-427) — a corner no real config uses; host
                return None
            fb256 = np.full(256, -1, np.int32)
            for bb in range(256):
                tid = m.vocab.get(f"<0x{bb:02X}>")
                if tid is not None:
                    fb256[bb] = tid

        if kind == "none":
            if fb256 is None or (fb256 < 0).any():
                return None
            from .bpe_merge2 import WORD_CAP

            if max(len(k.encode("utf-8")) for k in m.vocab) > WORD_CAP:
                return None

        unk_id = -1
        if m.unk_token is not None:
            unk_id = m.vocab.get(m.unk_token)
            if unk_id is None:
                return None  # host path raises UnkTokenOutOfVocabulary

        id_s1, id_s2 = build_char_id_tables(
            m.vocab, m.continuing_subword_prefix, m.end_of_word_suffix
        )
        if not m.merges:
            return None
        table = CuckooMergeTable(m.merges)
        n_ids = max(
            [m.get_vocab_size()]
            + [nid + 1 for (_r, nid) in m.merges.values()]
        )
        mclr = consume_mins(m.merges, n_ids)
        return CharBpeEngine(
            tokenizer, kind, id_s1, id_s2, fb256,
            -1 if unk_id is None else unk_id, table, mclr, prepend,
        )

    # ----------------------------------------------------------------- encode

    def _split_long(self, data: bytes, target: int):
        from .longdoc import split_long

        if self.kind != "none":
            return split_long(data, target)
        # no-pretok (Llama-2 SPM): the prepared text has ▁ instead of
        # spaces, and merges may span anything — a seam before a ▁ that
        # follows a non-▁ char is safe iff no vocab piece contains a ▁
        # preceded by a non-▁ char (every intermediate BPE token is a
        # vocab piece, so no token can ever cross such a boundary)
        if self._cross_safe is None:
            self._cross_safe = not any(
                any(
                    c == "▁" and k and key[k - 1] != "▁"
                    for k, c in enumerate(key)
                )
                for key in self.tokenizer.model.vocab
            )
        if not self._cross_safe:
            return [data]
        META = b"\xe2\x96\x81"
        out = []
        start = 0
        n = len(data)
        while n - start > target:
            hi = min(n - 3, start + target)
            seam = -1
            for i in range(hi, start, -1):
                if data[i : i + 3] == META and data[i - 3 : i] != META:
                    seam = i
                    break
            if seam <= start:
                return [data]
            out.append(data[start:seam])
            start = seam
        out.append(data[start:])
        return out

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

    def _program(self, buf, lengths):
        return charbpe_program(
            buf,
            lengths,
            self.d_id_s1,
            self.d_id_s2,
            self.d_fb256,
            self.unk_id,
            self.d_rows0,
            self.d_rows1,
            self.seed,
            self.d_mclr,
            cls_s1=self.d_cls_s1,
            cls_s2=self.d_cls_s2,
            kind=self.kind,
            byte_fallback=self.byte_fallback,
            has_unk=self.has_unk,
            fuse_unk=self.fuse_unk,
            prepend=self.prepend,
        )

    def _prepare_aligned(self, s: str):
        """Offsets path: normalize (and for Metaspace, replace+prepend —
        the exact host transform) on a NormalizedString so device byte
        spans map back to the original text through its alignments."""
        from ..normalized import NormalizedString

        ns = NormalizedString(s)
        nz = self.tokenizer.normalizer
        if nz is not None:
            nz.normalize(ns)
        if self.kind == "metaspace":
            ns.replace(" ", "▁")
            if self.prepend and not ns.get().startswith("▁"):
                ns.prepend("▁")
        return ns.get().encode("utf-8"), ns

    def _program_offsets(self, buf, lengths):
        kind = "metaspace_pre" if self.kind == "metaspace" else self.kind
        return charbpe_program(
            buf,
            lengths,
            self.d_id_s1,
            self.d_id_s2,
            self.d_fb256,
            self.unk_id,
            self.d_rows0,
            self.d_rows1,
            self.seed,
            self.d_mclr,
            cls_s1=self.d_cls_s1,
            cls_s2=self.d_cls_s2,
            kind=kind,
            byte_fallback=self.byte_fallback,
            has_unk=self.has_unk,
            fuse_unk=self.fuse_unk,
            prepend=self.prepend,
            with_offsets=True,
        )
