"""UnigramEngine: the compiled TPU path for SentencePiece-style pipelines.

Dispatched from `Tokenizer.encode_batch_fast` (see `ops/engine.py`) when the
pipeline is (Nmt + Replace-space-collapse) + Metaspace + Unigram — the
xlnet-style config of the reference's unigram benchmark
(`tokenizers/benches/unigram_benchmark.rs`, fixture `unigram.json`).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .engine_base import DeviceEngineBase
from .merge_table import CuckooMergeTable, _hash
from .unigram_encode import nmt_metaspace_class_table, unigram_program
from .wordpiece_encode import H1_MULT, H2_MULT
from .wordpiece_engine import _roll


class UnigramEngine(DeviceEngineBase):
    def __init__(self, tokenizer, model, vtab, scores, max_len, bf_tab=None):
        import threading

        self.tokenizer = tokenizer
        self.max_len = max_len
        self.unk_id = np.int32(model.unk_id)
        self._wc = None
        self._wc_lock = threading.Lock()

        self.d_bf = None if bf_tab is None else jnp.asarray(bf_tab)
        self.unk_score = np.float64(model.min_score - 10.0)
        # compensated-f32 representation for the TPU fast path
        # (unigram_dedup.py): [S, 8] rows with dd score bits, dd unk score
        from .unigram_dedup import dd_split

        uhi, ulo = dd_split(np.asarray([self.unk_score]))
        self.unk_hi = np.float32(uhi[0])
        self.unk_lo = np.float32(ulo[0])
        rows8 = []
        for t in (0, 1):
            hi, lo = dd_split(scores[t])
            z = np.zeros_like(vtab.rank[t])
            rows8.append(
                np.stack(
                    [
                        vtab.key_a[t],
                        vtab.key_b[t],
                        vtab.rank[t],
                        vtab.new_id[t],
                        hi.view(np.int32),
                        lo.view(np.int32),
                        z,
                        z,
                    ],
                    axis=-1,
                ).astype(np.int32)
            )
        self.d_vrows8_0 = jnp.asarray(rows8[0])
        self.d_vrows8_1 = jnp.asarray(rows8[1])
        s1, s2 = nmt_metaspace_class_table()
        self.d_cls_s1 = jnp.asarray(s1)
        self.d_cls_s2 = jnp.asarray(s2)
        self.d_vkey_a = jnp.asarray(vtab.key_a)
        self.d_vkey_b = jnp.asarray(vtab.key_b)
        self.d_vlen = jnp.asarray(vtab.rank)
        self.d_vid = jnp.asarray(vtab.new_id)
        with jax.enable_x64():
            self.d_vscore = jnp.asarray(scores.astype(np.float64))
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
    def try_build(tokenizer) -> Optional["UnigramEngine"]:
        from ..models.unigram import Unigram
        from ..normalizers import Nmt, Replace
        from ..normalizers import Sequence as NormSequence
        from ..pre_tokenizers.metaspace import PREPEND_ALWAYS, Metaspace

        m = tokenizer.model
        if not isinstance(m, Unigram):
            return None
        # fuse_unk is always true for deserialized models
        # (`unigram/model.rs:125`).
        if m.unk_id is None or not m.fuse_unk:
            return None
        # byte_fallback expands unk pieces into <0xXX> tokens of the
        # NORMALIZED piece string (reference `unigram/model.rs:429-446`);
        # the device programs implement it (byte_fallback_expand) when all
        # 256 byte pieces exist — so the per-piece "every byte token
        # present" check is vacuously true.  Incomplete tables (byte
        # fallback can then fail mid-span) take the host path.
        bf_tab = None
        if m.byte_fallback:
            bf_tab = np.full((256,), -1, np.int32)
            for b in range(256):
                i = m.token_to_ids.get("<0x%02X>" % b)
                if i is None:
                    return None
                bf_tab[b] = i
        nz = tokenizer.normalizer
        if not (
            isinstance(nz, NormSequence)
            and len(nz.normalizers) == 2
            and isinstance(nz.normalizers[0], Nmt)
            and isinstance(nz.normalizers[1], Replace)
            and getattr(nz.normalizers[1], "pattern_str", None) == " {2,}"
            and nz.normalizers[1].content == " "
        ):
            return None
        pt = tokenizer.pre_tokenizer
        if not (
            isinstance(pt, Metaspace)
            and pt.replacement == "▁"
            and pt.prepend_scheme == PREPEND_ALWAYS
            and pt.split
        ):
            return None

        entries = {}
        key_bytes = {}
        max_len = 4
        for i, (piece, score) in enumerate(m.vocab):
            bs = piece.encode("utf-8")
            if not bs:
                continue
            k1 = int(np.int32(_roll(bs, H1_MULT)))
            k2 = int(np.int32(_roll(bs, H2_MULT)))
            if (k1, k2) in entries:
                if key_bytes[(k1, k2)] != bs:
                    # true 64-bit hash collision between distinct pieces:
                    # the device table cannot disambiguate — host path
                    return None
                # duplicate piece string: the reference's token_to_ids
                # HashMap keeps the LAST occurrence's id
            entries[(k1, k2)] = (len(bs), i, float(score))
            key_bytes[(k1, k2)] = bs
            max_len = max(max_len, len(bs))
        if max_len > 64:
            return None
        vtab = CuckooMergeTable(
            {k: (l, i) for k, (l, i, _s) in entries.items()}
        )
        # slot-aligned score arrays (f64: Viterbi ties must match the
        # reference's double-precision sums)
        scores = np.zeros((2, vtab.size), np.float64)
        for (k1, k2), (l, i, sc) in entries.items():
            placed = False
            for t in (0, 1):
                h = int(
                    _hash(np.array([k1]), np.array([k2]), vtab.seed, vtab.mask, t)[0]
                )
                if vtab.key_a[t][h] == k1 and vtab.key_b[t][h] == k2:
                    scores[t][h] = sc
                    placed = True
                    break
            if not placed:
                return None
        return UnigramEngine(tokenizer, m, vtab, scores, max_len, bf_tab)

    # ----------------------------------------------------------------- encode

    supports_offsets = True
    offsets_space = "original_chars"

    def _program_offsets(self, buf, lengths):
        with jax.enable_x64():
            return self._program_offsets_x64(buf, lengths)

    @staticmethod
    def _prog():
        """Word-packed Viterbi (scan depth = 512 packed columns instead of
        one step per normalized byte) — the dense program remains the
        oracle, selected on the CPU test backend."""
        from .merge_pallas import on_accelerator
        from .unigram_packed import unigram_program_packed

        return unigram_program_packed if on_accelerator() else unigram_program

    def _program_offsets_x64(self, buf, lengths):
        return self._prog()(
            buf,
            lengths,
            cls_s1=self.d_cls_s1,
            cls_s2=self.d_cls_s2,
            vkey_a=self.d_vkey_a,
            vkey_b=self.d_vkey_b,
            vlen=self.d_vlen,
            vid=self.d_vid,
            vscore=self.d_vscore,
            vseed=self.vseed,
            pow1=self.d_pow1,
            pow2=self.d_pow2,
            unk_id=self.unk_id,
            unk_score=self.unk_score,
            max_len=self.max_len,
            with_offsets=True,
            bf_tab=self.d_bf,
        )

    def _token_strings(self, ids, text, st_c, en_c):
        # unk tokens carry the covered text as their value (reference
        # `unigram/model.rs` backtrack emits the raw piece), minus chars the
        # Nmt normalizer deletes; other ids map through the vocab.
        from ..normalizers import Nmt

        vocab = self.tokenizer.model.vocab
        unk = int(self.unk_id)
        out = []
        for k, t in enumerate(ids):
            if t == unk:
                span = text[int(st_c[k]) : int(en_c[k])]
                out.append(
                    "".join(c for c in span if ord(c) not in Nmt._FILTERED)
                )
            else:
                out.append(vocab[t][0])
        return out

    # persistent word-cache sizing (see ByteLevelBpeEngine)
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
            cls_s1=self.d_cls_s1,
            cls_s2=self.d_cls_s2,
            vrows0=self.d_vrows8_0,
            vrows1=self.d_vrows8_1,
            vseed=self.vseed,
            pow1=self.d_pow1,
            pow2=self.d_pow2,
            unk_id=self.unk_id,
            unk_hi=self.unk_hi,
            unk_lo=self.unk_lo,
            max_len=self.max_len,
            bf_tab=self.d_bf,
        )

    def _use_dedup(self) -> bool:
        from .merge_pallas import on_accelerator

        return on_accelerator()

    def _encode_word_host(self, prepared: bytes, col: int, wlen: int):
        """Host-exact ids for one flagged word: `col`/`wlen` address the
        device's normalized stream (Nmt + space-collapse + Metaspace), so
        rebuild that stream host-side, slice the word, and run the f64
        Viterbi (the conformance oracle) on it."""
        stream = self._norm_stream(prepared)
        piece = stream[col : col + wlen]
        try:
            word = piece.decode("utf-8")
        except UnicodeDecodeError:
            return None
        toks = self.tokenizer.model.tokenize(word)
        return np.asarray([t.id for t in toks], np.int32)

    def _norm_stream(self, prepared: bytes) -> bytes:
        """The device programs' normalized text space, recomputed host-side
        (bit-equal: normalize_metaspace is conformance-tested against this
        pipeline): normalizer chain, then Metaspace replace + prepend."""
        s = prepared.decode("utf-8")
        ns = self.tokenizer.normalizer.normalize_str(s)
        meta = ns.replace(" ", "▁")
        if not meta.startswith("▁"):
            meta = "▁" + meta
        return meta.encode("utf-8")

    def _program(self, buf, lengths):
        if self._use_dedup():
            from .unigram_dedup import unigram_dedup_program

            with self._wc_lock:
                st = self._ensure_cache()
                ids, ntok, bad, ptab, nflag, st2 = unigram_dedup_program(
                    buf,
                    lengths,
                    word_cache=True,
                    cache_rows=st[0],
                    cache_buf=st[1],
                    cache_p=st[2],
                    **self._dedup_args(),
                )
                self._wc = list(st2)
            return ids, ntok, bad, (ptab, nflag)
        with jax.enable_x64():
            return self._program_x64(buf, lengths)

    def _program_many(self, chunks):
        """Batch same-shape chunks into one `lax.scan` dispatch with the
        word cache as carry (`unigram_dedup_scan`)."""
        from ..parallel.runtime import get_default_mesh

        mesh = get_default_mesh()
        if (
            not self._use_dedup()
            or (mesh is not None and mesh.devices.size > 1)
        ):
            return DeviceEngineBase._program_many(self, chunks)

        from .unigram_dedup import unigram_dedup_scan

        groups: dict = {}
        for i, (buf, _lens, _orig) in enumerate(chunks):
            groups.setdefault(buf.shape, []).append(i)

        out: List[Optional[tuple]] = [None] * len(chunks)
        for key, idxs in groups.items():
            if len(idxs) == 1:
                i = idxs[0]
                out[i] = self._program(chunks[i][0], chunks[i][1])
                continue
            with self._wc_lock:
                st = self._ensure_cache()
                bufs = np.stack([chunks[i][0] for i in idxs])
                lens = np.stack([chunks[i][1] for i in idxs])
                ids, ntok, bad, ptab, nflag, st2 = unigram_dedup_scan(
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
                out[i] = (ids[k], ntok[k], bad[k], (ptab[k], nflag[k]))
        return out

    def _program_x64(self, buf, lengths):
        return self._prog()(
            buf,
            lengths,
            cls_s1=self.d_cls_s1,
            cls_s2=self.d_cls_s2,
            vkey_a=self.d_vkey_a,
            vkey_b=self.d_vkey_b,
            vlen=self.d_vlen,
            vid=self.d_vid,
            vscore=self.d_vscore,
            vseed=self.vseed,
            pow1=self.d_pow1,
            pow2=self.d_pow2,
            unk_id=self.unk_id,
            unk_score=self.unk_score,
            max_len=self.max_len,
            bf_tab=self.d_bf,
        )
