"""ByteLevelBpeEngine: the compiled TPU path for GPT-2-style pipelines.

Dispatched from `Tokenizer.encode_batch_fast` (see `ops/engine.py`) when the
pipeline is exactly: no normalizer + ByteLevel pre-tokenizer (regex split) +
BPE model (no dropout / prefix / suffix / byte-fallback / ignore-merges) +
ByteLevel-or-no post-processor.  This covers the reference's flagship
benchmark config (gpt2; `tokenizers/benches/bpe_benchmark.rs`).

Two surfaces:
  * `encode_batch`  -> list[Encoding], bit-exact with the host path (and
    therefore with the reference Rust implementation).
  * `encode_batch_arrays` -> (ids int32[B, T], n_tokens int32[B]) as device
    arrays — the TPU-native serving API: token ids stay on device, ready to
    feed a model without a host round-trip.

Inputs containing added/special tokens (e.g. "<|endoftext|>") are routed to
the host path per string, preserving batch order (reference semantics:
`added_vocabulary.rs:455` extracts them before the model runs).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ..encoding import Encoding
from .bpe_encode import encode_program
from .merge_table import CuckooMergeTable
from .packing import MAX_L, pack_batch
from .unicode_tables import char_class_tables


class ByteLevelBpeEngine:
    def __init__(self, tokenizer, byte2id: np.ndarray, table: CuckooMergeTable):
        self.tokenizer = tokenizer
        self.add_prefix_space = tokenizer.pre_tokenizer.add_prefix_space
        stage1, stage2 = char_class_tables()
        # device-resident constants (replicated per chip)
        self.d_byte2id = jnp.asarray(byte2id)
        self.d_stage1 = jnp.asarray(stage1)
        self.d_stage2 = jnp.asarray(stage2)
        self.d_key_a = jnp.asarray(table.key_a)
        self.d_key_b = jnp.asarray(table.key_b)
        self.d_rank = jnp.asarray(table.rank)
        self.d_new_id = jnp.asarray(table.new_id)
        self.seed = jnp.int32(table.seed)

    # ------------------------------------------------------------------ build

    @staticmethod
    def try_build(tokenizer) -> Optional["ByteLevelBpeEngine"]:
        from ..models.bpe import BPE
        from ..pre_tokenizers.byte_level import BYTES_CHAR, ByteLevel

        if tokenizer.normalizer is not None:
            return None
        pt = tokenizer.pre_tokenizer
        if not isinstance(pt, ByteLevel) or not pt.use_regex:
            return None
        m = tokenizer.model
        if not isinstance(m, BPE):
            return None
        if m.dropout not in (None, 0.0):
            return None
        if m.continuing_subword_prefix or m.end_of_word_suffix:
            return None
        if m.byte_fallback or m.ignore_merges:
            return None
        pp = tokenizer.post_processor
        if pp is not None and not isinstance(pp, ByteLevel):
            return None
        if tokenizer.truncation is not None:
            return None

        byte2id = np.zeros(256, dtype=np.int32)
        for b in range(256):
            id = m.vocab.get(BYTES_CHAR[b])
            if id is None:
                return None  # incomplete byte alphabet: host path handles unk
            byte2id[b] = id
        table = CuckooMergeTable(m.merges)
        return ByteLevelBpeEngine(tokenizer, byte2id, table)

    # ----------------------------------------------------------------- encode

    def _prepare(self, s: str) -> bytes:
        if self.add_prefix_space and not s.startswith(" "):
            s = " " + s
        return s.encode("utf-8")

    def _run_device(self, byte_strings: List[bytes]):
        """Returns per-input list of np.int32 id arrays."""
        results: List[Optional[np.ndarray]] = [None] * len(byte_strings)
        for buf, lengths, orig in pack_batch(byte_strings):
            ids, ntok = encode_program(
                buf,
                lengths,
                self.d_byte2id,
                self.d_stage1,
                self.d_stage2,
                self.d_key_a,
                self.d_key_b,
                self.d_rank,
                self.d_new_id,
                self.seed,
            )
            ids = np.asarray(ids)
            ntok = np.asarray(ntok)
            for r, i in enumerate(orig):
                results[i] = ids[r, : ntok[r]]
        return results

    def encode_batch(self, inputs: List[str], add_special_tokens: bool) -> List[Encoding]:
        added = list(self.tokenizer.added_vocabulary.added_tokens_map)
        device_idx: List[int] = []
        byte_strings: List[bytes] = []
        encodings: List[Optional[Encoding]] = [None] * len(inputs)
        for i, s in enumerate(inputs):
            if any(t in s for t in added) or len(s) > MAX_L // 2:
                # host path: added-token extraction / very long input
                encodings[i] = self.tokenizer._encode(
                    s, None, add_special_tokens, "none"
                )
            else:
                device_idx.append(i)
                byte_strings.append(self._prepare(s))

        if device_idx:
            for i, ids in zip(device_idx, self._run_device(byte_strings)):
                n = len(ids)
                enc = Encoding(
                    ids=ids.tolist(),
                    type_ids=[0] * n,
                    tokens=[""] * n,
                    words=[None] * n,
                    offsets=[(0, 0)] * n,
                )
                encodings[i] = self.tokenizer.post_process(
                    enc, None, add_special_tokens
                )
        return encodings

    def encode_batch_arrays(self, inputs: List[str]):
        """TPU-native batch encode: returns list of (ids, ntok) device-array
        pairs, one per packed chunk, plus the index mapping. No host
        materialization; callers feeding a model keep everything on device."""
        byte_strings = [self._prepare(s) for s in inputs]
        out = []
        for buf, lengths, orig in pack_batch(byte_strings):
            ids, ntok = encode_program(
                buf,
                lengths,
                self.d_byte2id,
                self.d_stage1,
                self.d_stage2,
                self.d_key_a,
                self.d_key_b,
                self.d_rank,
                self.d_new_id,
                self.seed,
            )
            out.append((ids, ntok, orig))
        return out
