"""WordPieceEngine: the compiled TPU path for BERT-style pipelines.

Dispatched from `Tokenizer.encode_batch_fast` (see `ops/engine.py`) when the
pipeline is BertNormalizer + BertPreTokenizer + WordPiece — the reference's
second headline benchmark config (`tokenizers/benches/bert_benchmark.rs`).
Post-processing ([CLS]/[SEP] templates, truncation, padding) applies
host-side per encoding, as in the BPE engine.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from .bert_tables import bert_class_tables, bert_normalizer_tables
from .engine_base import DeviceEngineBase
from .merge_table import CuckooMergeTable
from .wordpiece_encode import (
    CONT_MIX1,
    CONT_MIX2,
    H1_MULT,
    H2_MULT,
    wordpiece_program,
)


def _roll(data: bytes, mult: np.uint32) -> np.int32:
    h = np.uint32(0)
    with np.errstate(over="ignore"):
        for byte in data:
            h = h * mult + np.uint32(byte + 1)
    return np.int32(h)


class WordPieceEngine(DeviceEngineBase):
    def __init__(self, tokenizer, model, norm_tables, cls_tables, vtab, max_len):
        import threading

        self.tokenizer = tokenizer
        self._wc = None
        self._wc_lock = threading.Lock()
        self.max_len = max_len
        self.max_word_chars = model.max_input_chars_per_word
        self.unk_id = np.int32(model.vocab[model.unk_token])
        s1, ob, ol = norm_tables
        c1, c2 = cls_tables
        self.d_norm_s1 = jnp.asarray(s1)
        self.d_norm_ob = jnp.asarray(ob)
        self.d_norm_ol = jnp.asarray(ol)
        self.d_cls_s1 = jnp.asarray(c1)
        self.d_cls_s2 = jnp.asarray(c2)
        # ascii fast path: normalization as a 256-entry byte map (255 =
        # dropped char) + per-byte class map, derived from the SAME generic
        # tables so both paths agree byte-for-byte
        ascii_ok = True
        nbmap = np.full(256, 255, np.int32)
        for cp in range(128):
            t = (int(s1[cp >> 8]) << 8) | (cp & 255)
            ln = int(ol[t])
            if ln == 0:
                continue  # dropped
            if ln == 1 and int(ob[t, 0]) < 128:
                nbmap[cp] = int(ob[t, 0])
            else:
                ascii_ok = False  # ascii char normalizing to multi-byte
                break
        clsmap = np.zeros(256, np.int32)
        for v in range(128):
            pg = int(c1[0])
            clsmap[v] = int(c2[(pg << 8) | v])
        self.ascii_ok = ascii_ok
        self.d_ascii_nb = jnp.asarray(nbmap)
        self.d_ascii_cls = jnp.asarray(clsmap)
        self.d_vrows0 = jnp.asarray(vtab.rows(0))
        self.d_vrows1 = jnp.asarray(vtab.rows(1))
        self.vseed = jnp.int32(vtab.seed)
        with np.errstate(over="ignore"):
            p1 = np.ones(max_len + 1, np.uint32)
            p2 = np.ones(max_len + 1, np.uint32)
            for i in range(1, max_len + 1):
                p1[i] = p1[i - 1] * H1_MULT
                p2[i] = p2[i - 1] * H2_MULT
        self.d_pow1 = jnp.asarray(p1)
        self.d_pow2 = jnp.asarray(p2)

    # ------------------------------------------------------------------ build

    @staticmethod
    def try_build(tokenizer) -> Optional["WordPieceEngine"]:
        from ..models.wordpiece import WordPiece
        from ..normalizers import BertNormalizer
        from ..pre_tokenizers import BertPreTokenizer

        m = tokenizer.model
        if not isinstance(m, WordPiece):
            return None
        if not isinstance(tokenizer.pre_tokenizer, BertPreTokenizer):
            return None
        nz = tokenizer.normalizer
        if not isinstance(nz, BertNormalizer):
            return None
        if m.unk_token not in m.vocab:
            return None

        prefix = m.continuing_subword_prefix or ""
        entries = {}
        max_len = 1
        for tok_str, tid in m.vocab.items():
            cont = prefix and tok_str.startswith(prefix)
            content = tok_str[len(prefix) :] if cont else tok_str
            bs = content.encode("utf-8")
            if not bs:
                continue
            k1 = int(_roll(bs, H1_MULT)) ^ (int(CONT_MIX1) if cont else 0)
            k2 = int(_roll(bs, H2_MULT)) ^ (int(CONT_MIX2) if cont else 0)
            k1 = int(np.int32(k1))
            k2 = int(np.int32(k2))
            if (k1, k2) in entries:
                return None  # vocab hash collision: host path
            entries[(k1, k2)] = (len(bs), tid)
            max_len = max(max_len, len(bs))
        if max_len > 128:
            return None
        vtab = CuckooMergeTable(entries)

        norm_tables = bert_normalizer_tables(
            nz.clean_text, nz.handle_chinese_chars, nz.strip_accents, nz.lowercase
        )
        cls_tables = bert_class_tables()
        return WordPieceEngine(
            tokenizer, m, norm_tables, cls_tables, vtab, max_len
        )

    # ----------------------------------------------------------------- encode

    supports_offsets = True
    offsets_space = "original_chars"

    @staticmethod
    def _is_ascii(buf) -> bool:
        return isinstance(buf, np.ndarray) and int(buf.max(initial=0)) < 128

    def _run(self, buf, lengths, with_offsets):
        ascii_fast = self.ascii_ok and self._is_ascii(buf)
        return wordpiece_program(
            buf,
            lengths,
            self.d_norm_s1,
            self.d_norm_ob,
            self.d_norm_ol,
            self.d_cls_s1,
            self.d_cls_s2,
            self.d_vrows0,
            self.d_vrows1,
            self.vseed,
            self.d_pow1,
            self.d_pow2,
            self.unk_id,
            max_len=self.max_len,
            max_word_chars=self.max_word_chars,
            expand=1 if ascii_fast else 2,
            with_offsets=with_offsets,
            ascii_only=ascii_fast,
            ascii_nb=self.d_ascii_nb if ascii_fast else None,
            ascii_cls=self.d_ascii_cls if ascii_fast else None,
        )

    def _program_offsets(self, buf, lengths):
        return self._run(buf, lengths, True)

    # persistent word-cache sizing (see ByteLevelBpeEngine): 1M
    # direct-mapped rows + 16M token append buffer, in-graph epoch reset
    WC_SLOTS = 1 << 20
    WC_CAP = 1 << 24

    def _ensure_cache(self):
        if self._wc is None:
            self._wc = [
                jnp.zeros((self.WC_SLOTS, 4), jnp.int32),
                jnp.full((self.WC_CAP + 1,), -1, jnp.int32),
                jnp.zeros((), jnp.int32),
            ]
        return self._wc

    def _dedup_args(self):
        return dict(
            ascii_nb=self.d_ascii_nb,
            ascii_cls=self.d_ascii_cls,
            vrows0=self.d_vrows0,
            vrows1=self.d_vrows1,
            vseed=self.vseed,
            pow1=self.d_pow1,
            pow2=self.d_pow2,
            unk_id=self.unk_id,
            max_len=self.max_len,
            max_word_chars=self.max_word_chars,
        )

    def _use_dedup(self, buf) -> bool:
        from .merge_pallas import on_accelerator

        return self.ascii_ok and self._is_ascii(buf) and on_accelerator()

    def _program(self, buf, lengths):
        # ASCII chunks ride the batch word-dedup machinery off-CPU: the
        # candidate sweep + greedy chain run over unique words only
        # (~15-25% of the text).  The dense program stays the oracle.
        if self._use_dedup(buf):
            from .wordpiece_dedup import wordpiece_dedup_program

            with self._wc_lock:
                st = self._ensure_cache()
                ids, ntok, bad, st2 = wordpiece_dedup_program(
                    buf,
                    lengths,
                    word_cache=True,
                    cache_rows=st[0],
                    cache_buf=st[1],
                    cache_p=st[2],
                    **self._dedup_args(),
                )
                self._wc = list(st2)
            return ids, ntok, bad
        return self._run(buf, lengths, False)

    def _program_many(self, chunks):
        """Batch same-shape ASCII chunks into single `lax.scan` dispatches
        with the word cache as carry (`wordpiece_dedup_scan`) — the same
        one-transport-round-trip batching the BPE engine does."""
        from ..parallel.runtime import get_default_mesh
        from .wordpiece_dedup import wordpiece_dedup_scan

        mesh = get_default_mesh()
        if mesh is not None and mesh.devices.size > 1:
            return DeviceEngineBase._program_many(self, chunks)

        groups: dict = {}
        for i, (buf, _lens, _orig) in enumerate(chunks):
            key = buf.shape if self._use_dedup(buf) else None
            groups.setdefault(key, []).append(i)

        out: List[Optional[tuple]] = [None] * len(chunks)
        for key, idxs in groups.items():
            if key is None or len(idxs) == 1:
                for i in idxs:
                    buf, lens, _ = chunks[i]
                    out[i] = self._program(buf, lens)
                continue
            with self._wc_lock:
                st = self._ensure_cache()
                bufs = np.stack([chunks[i][0] for i in idxs])
                lens = np.stack([chunks[i][1] for i in idxs])
                ids, ntok, bad, st2 = wordpiece_dedup_scan(
                    bufs,
                    lens,
                    word_cache=True,
                    cache_rows=st[0],
                    cache_buf=st[1],
                    cache_p=st[2],
                    **self._dedup_args(),
                )
                self._wc = list(st2)
            for k, i in enumerate(idxs):
                out[i] = (ids[k], ntok[k], bad[k])
        return out
