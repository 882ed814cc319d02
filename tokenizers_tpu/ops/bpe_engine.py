"""ByteLevelBpeEngine: the compiled TPU path for byte-level BPE pipelines.

Dispatched from `Tokenizer.encode_batch_fast` (see `ops/engine.py`) for the
two flagship pipeline shapes:

  * **gpt2**: no normalizer + ByteLevel pre-tokenizer (GPT-2 regex split) +
    plain BPE — the reference's headline benchmark config
    (`tokenizers/benches/bpe_benchmark.rs`).
  * **llama3**: Split(llama-3 pattern) + ByteLevel(no prefix space, no
    regex) + BPE with `ignore_merges` (whole-word vocab bypass,
    `models/bpe/model.rs:475-497`), as in `benches/llama3_benchmark.rs`.

Two surfaces:
  * `encode_batch`  -> list[Encoding], bit-exact with the host path (and
    therefore with the reference Rust implementation); post-processing
    (templates, truncation, padding) applies host-side per encoding.
  * `encode_batch_arrays` -> device-resident (ids, n_tokens) arrays — the
    TPU-native serving API: token ids never leave the device.

Inputs containing added/special tokens are routed to the host path per
string, preserving batch order (reference `added_vocabulary.rs:455`
extracts them before the model runs).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from .bpe_encode import encode_program
from .engine_base import DeviceEngineBase
from .merge_table import CuckooMergeTable, consume_mins
from .unicode_tables import char_class_flat

LLAMA3_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

_H1 = 0x01000193
_H2 = 0x0000C597


def _roll_hash(data: bytes, mult: int) -> int:
    h = 0
    for byte in data:
        h = (h * mult + byte + 1) & 0xFFFFFFFF
    return np.int32(np.uint32(h))


class ByteLevelBpeEngine(DeviceEngineBase):
    def __init__(
        self,
        tokenizer,
        byte2id: np.ndarray,
        table: CuckooMergeTable,
        mclr: np.ndarray,
        boundary: str,
        add_prefix_space: bool,
        ww_table: Optional[CuckooMergeTable] = None,
    ):
        self.tokenizer = tokenizer
        self.boundary = boundary
        self.add_prefix_space = add_prefix_space
        # device-resident constants (replicated per chip)
        self.d_byte2id = jnp.asarray(byte2id)
        self.d_cls = jnp.asarray(char_class_flat())
        self.d_rows0 = jnp.asarray(table.rows8(0, mclr))
        self.d_rows1 = jnp.asarray(table.rows8(1, mclr))
        self.d_mclr = jnp.asarray(mclr)
        self.seed = jnp.int32(table.seed)
        if ww_table is not None:
            self.whole_word = True
            self.d_ww = dict(
                ww_rows0=jnp.asarray(ww_table.rows(0)),
                ww_rows1=jnp.asarray(ww_table.rows(1)),
                ww_seed=jnp.int32(ww_table.seed),
            )
        else:
            self.whole_word = False
            self.d_ww = dict(ww_rows0=None, ww_rows1=None)
        # persistent cross-batch word cache (device arrays), lazily built;
        # guarded because async_encode may drive the engine from threads
        # and the cache buffers are donated to each program call
        import threading

        self._wc = None
        self._wc_lock = threading.Lock()

    # ------------------------------------------------------------------ build

    @staticmethod
    def try_build(tokenizer) -> Optional["ByteLevelBpeEngine"]:
        from ..models.bpe import BPE
        from ..pre_tokenizers import Sequence, Split
        from ..pre_tokenizers.byte_level import BYTES_CHAR, ByteLevel

        if tokenizer.normalizer is not None:
            return None
        m = tokenizer.model
        if not isinstance(m, BPE):
            return None
        if m.dropout not in (None, 0.0):
            return None
        if m.continuing_subword_prefix or m.end_of_word_suffix:
            return None
        if m.byte_fallback:
            return None

        pt = tokenizer.pre_tokenizer
        boundary = None
        add_prefix_space = False
        if isinstance(pt, ByteLevel) and pt.use_regex:
            boundary = "gpt2"
            add_prefix_space = pt.add_prefix_space
        elif (
            isinstance(pt, Sequence)
            and len(pt.pretokenizers) == 2
            and isinstance(pt.pretokenizers[0], Split)
            and isinstance(pt.pretokenizers[1], ByteLevel)
        ):
            sp, bl = pt.pretokenizers
            if (
                getattr(sp, "pattern_str", None) == LLAMA3_PATTERN
                and sp.behavior == "isolated"
                and not getattr(sp, "invert", False)
                and not bl.use_regex
            ):
                boundary = "llama3"
                add_prefix_space = bl.add_prefix_space
        if boundary is None:
            return None

        byte2id = np.zeros(256, dtype=np.int32)
        for bb in range(256):
            id = m.vocab.get(BYTES_CHAR[bb])
            if id is None:
                return None  # incomplete byte alphabet: host path handles unk
            byte2id[bb] = id

        table = CuckooMergeTable(m.merges)
        n_ids = max(
            [m.get_vocab_size()]
            + [nid + 1 for (_r, nid) in m.merges.values()]
        )
        mclr = consume_mins(m.merges, n_ids)

        ww_table = None
        if m.ignore_merges:
            from ..pre_tokenizers.byte_level import CHAR_BYTES

            entries = {}
            for tok_str, tid in m.vocab.items():
                bs = bytearray()
                ok = True
                for c in tok_str:
                    bb = CHAR_BYTES.get(c)
                    if bb is None:
                        ok = False
                        break
                    bs.append(bb)
                if not ok or len(bs) < 2:
                    continue
                key = (
                    int(_roll_hash(bytes(bs), _H1)),
                    int(_roll_hash(bytes(bs), _H2)),
                )
                if key in entries:
                    return None  # hash collision in vocab: bail to host path
                entries[key] = (len(bs), tid)
            ww_table = CuckooMergeTable(entries)

        return ByteLevelBpeEngine(
            tokenizer, byte2id, table, mclr, boundary, add_prefix_space,
            ww_table,
        )

    # ----------------------------------------------------------------- encode

    supports_offsets = True

    # persistent word-cache sizing: 1M direct-mapped rows (16MB) + a 16M
    # token append buffer (64MB); an in-graph epoch reset recycles both
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

    @staticmethod
    def _is_ascii(buf) -> bool:
        return isinstance(buf, np.ndarray) and int(buf.max(initial=0)) < 128

    def _program(self, buf, lengths):
        import jax

        sharded = (
            isinstance(buf, jax.Array) and len(buf.sharding.device_set) > 1
        )
        if sharded:
            # mesh path: SPMD over shards; per-chip mutable cache state is
            # not threaded through shard_map (each chip would diverge)
            return encode_program(buf, lengths, **self._program_args())
        with self._wc_lock:
            return self._program_locked(buf, lengths, self._is_ascii(buf))

    def _program_locked(self, buf, lengths, ascii_only):
        st = self._ensure_cache()
        ids, ntok, bad, st2 = encode_program(
            buf,
            lengths,
            word_cache=True,
            cache_rows=st[0],
            cache_buf=st[1],
            cache_p=st[2],
            ascii_only=ascii_only,
            **self._program_args(),
        )
        self._wc = list(st2)
        return ids, ntok, bad

    def _program_many(self, chunks):
        """Batch same-shape chunks into single `lax.scan` dispatches with
        the word cache as carry (see `encode_program_scan`): one transport
        round-trip for the whole batch, and each distinct word in the batch
        merges exactly once."""
        from ..parallel.runtime import get_default_mesh
        from .bpe_encode import encode_program_scan

        mesh = get_default_mesh()
        if mesh is not None and mesh.devices.size > 1:
            # mesh-sharded SPMD dispatch (no mutable cache across shards)
            return DeviceEngineBase._program_many(self, chunks)

        groups: dict = {}
        for i, (buf, _lens, _orig) in enumerate(chunks):
            key = (
                (buf.shape, self._is_ascii(buf))
                if isinstance(buf, np.ndarray)
                else None
            )
            groups.setdefault(key, []).append(i)

        out: List[Optional[tuple]] = [None] * len(chunks)
        with self._wc_lock:
            for key, idxs in groups.items():
                if key is None or len(idxs) == 1:
                    for i in idxs:
                        buf, lens, _ = chunks[i]
                        out[i] = self._program_locked(
                            buf, lens, key is not None and key[1]
                        )
                    continue
                _shape, ascii_only = key
                st = self._ensure_cache()
                bufs = np.stack([chunks[i][0] for i in idxs])
                lens = np.stack([chunks[i][1] for i in idxs])
                ids, ntok, bad, st2 = encode_program_scan(
                    bufs,
                    lens,
                    cache_rows=st[0],
                    cache_buf=st[1],
                    cache_p=st[2],
                    ascii_only=ascii_only,
                    **self._program_args(),
                )
                self._wc = list(st2)
                for k, i in enumerate(idxs):
                    out[i] = (ids[k], ntok[k], bad[k])
        return out

    def _program_offsets(self, buf, lengths):
        return encode_program(
            buf, lengths, with_offsets=True, **self._program_args()
        )

    def _program_args(self):
        return dict(
            byte2id=self.d_byte2id,
            cls_table=self.d_cls,
            merge_rows0=self.d_rows0,
            merge_rows1=self.d_rows1,
            merge_mclr=self.d_mclr,
            seed=self.seed,
            boundary=self.boundary,
            whole_word=self.whole_word,
            **self.d_ww,
        )
