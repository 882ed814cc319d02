"""Shared host-side driver for the device encode engines.

Handles what every engine needs around its compiled program: added-token
routing to the host path, packing, row-level host fallback (row_bad), and
long-document sharding at tokenization-safe seams (`longdoc.py`) so
oversized inputs run on device in chunks whose token streams concatenate
exactly."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..encoding import Encoding
from .longdoc import split_long
from .packing import MAX_L, pack_batch

CHUNK_TARGET = 1 << 15  # ~32KB device chunks for long documents


class FallbackStats:
    """Process-global counters for the host-fallback residue.

    The device engines silently re-encode on the host (a) inputs containing
    added/special tokens or lacking a safe long-doc seam (routed *before*
    the device runs) and (b) rows the compiled program flags `row_bad`
    (overlong words, buffer overflow, unigram near-ties).  At GB/s targets
    a fraction-of-a-percent host residue becomes the bottleneck, and a
    silent rise masks device regressions — so the fractions are counted
    here, emitted by bench.py, and ceiling-asserted in the device tests."""

    __slots__ = ("device_rows", "bad_rows", "host_pre_inputs",
                 "total_inputs", "patched_words")

    def __init__(self):
        self.reset()

    def reset(self):
        self.device_rows = 0  # work items sent to the compiled program
        self.bad_rows = 0  # of those, flagged row_bad -> host re-encode
        self.host_pre_inputs = 0  # inputs host-routed before the device
        self.total_inputs = 0
        self.patched_words = 0  # per-word host splices (rows stay device)

    def snapshot(self) -> dict:
        return {
            "device_rows": self.device_rows,
            "bad_rows": self.bad_rows,
            "bad_row_fraction": (
                self.bad_rows / self.device_rows if self.device_rows else 0.0
            ),
            "host_pre_inputs": self.host_pre_inputs,
            "total_inputs": self.total_inputs,
            "patched_words": self.patched_words,
        }


STATS = FallbackStats()


def _offset_tables(text: str):
    data = np.frombuffer(text.encode("utf-8"), np.uint8)
    is_start = (data & 0xC0) != 0x80
    cidx = np.cumsum(is_start) - 1 if len(data) else np.zeros(0, np.int64)
    char_pos = np.flatnonzero(is_start)
    return data, cidx, char_pos


def _bytes_to_chars(text: str, starts: np.ndarray, ends: np.ndarray):
    """Original-byte offsets -> char offsets, expanded to full characters
    (NormalizedString alignments give every byte of a char the whole char's
    span, reference `normalizer.rs`; `BytesToCharOffsetConverter` then maps
    byte ends to the containing char)."""
    data, cidx, _ = _offset_tables(text)
    n = len(data)
    if n == 0:
        return starts * 0, ends * 0
    st = cidx[np.clip(starts, 0, n - 1)]
    en = np.where(
        ends > starts, cidx[np.clip(ends - 1, 0, n - 1)] + 1, st
    )
    return st.astype(np.int64), en.astype(np.int64)


def _chars_to_bytes(text: str, starts: np.ndarray, ends: np.ndarray):
    """Char offsets -> byte offsets."""
    data, _cidx, char_pos = _offset_tables(text)
    n = len(data)
    if n == 0:
        return starts * 0, ends * 0
    cp = np.concatenate([char_pos, [n]])
    m = len(cp) - 1
    st = cp[np.clip(starts, 0, m)]
    en = cp[np.clip(ends, 0, m)]
    return st.astype(np.int64), en.astype(np.int64)


def _expand_bytes(text: str, starts: np.ndarray, ends: np.ndarray):
    """Expand byte spans to char boundaries (byte-referential offsets)."""
    data, cidx, char_pos = _offset_tables(text)
    n = len(data)
    if n == 0:
        return starts * 0, ends * 0
    st = char_pos[cidx[np.clip(starts, 0, n - 1)]]
    last_char = cidx[np.clip(ends - 1, 0, n - 1)]
    nxt = last_char + 1
    en = np.where(
        nxt < len(char_pos), char_pos[np.clip(nxt, 0, len(char_pos) - 1)], n
    )
    en = np.where(ends > starts, en, st)
    return st.astype(np.int64), en.astype(np.int64)


class DeviceEngineBase:
    tokenizer = None
    add_prefix_space = False
    supports_offsets = False  # subclass may provide _program_offsets
    # _program_offsets return space:
    #   "prepared_bytes"   — byte offsets into the prepared text (byte-level
    #                        BPE; prepared == original up to a prefix space)
    #   "original_chars"   — char offsets into the original text (WordPiece:
    #                        source-char tracking runs on device)
    #   "normalized_bytes" — byte offsets into the HOST-normalized text;
    #                        remapped to original-byte spans through the
    #                        NormalizedString alignments `_prepare_aligned`
    #                        captured (the reference's `convert_offsets`
    #                        mechanism, `tokenizer/normalizer.rs:156`)
    offsets_space = "prepared_bytes"

    def _prepare_aligned(self, s: str):
        """(prepared bytes, NormalizedString|None) — engines whose
        `_prepare` normalizes host-side override this so the offsets path
        can map normalized spans back to the original text.  None means
        prepared == original (no normalizer)."""
        return self._prepare(s), None

    # subclass provides: _program(buf, lengths) -> (ids, ntok, row_bad)

    def _prepare(self, s: str) -> bytes:
        if self.add_prefix_space and not s.startswith(" "):
            s = " " + s
        return s.encode("utf-8")

    def _needs_host(self, s: str, added) -> bool:
        """Route this input to the host path?  Default: it contains an
        added/special token (the host pipeline extracts those before the
        model, reference `added_vocabulary.rs:455`).  Engines whose
        `_prepare` normalizes host-side also match added tokens against
        the normalized text (a `normalized=True` added token can surface
        only after normalization)."""
        return any(t in s for t in added)

    def _split_long(self, data: bytes, target: int) -> List[bytes]:
        """Split oversized prepared inputs at tokenization-safe seams;
        engines may override with pipeline-specific seam rules.  Returning
        [data] means no safe seam (caller falls back to the host path)."""
        return split_long(data, target)

    def _shard_chunk(self, buf, lengths):
        """Lay a packed chunk out over the process-global default mesh
        (parallel/runtime.py) when one is configured: rows sharded over
        every mesh axis, so the jitted program runs SPMD with no
        cross-chip communication.  No-op without a default mesh."""
        from ..parallel.runtime import get_default_mesh

        mesh = get_default_mesh()
        if mesh is None or mesh.devices.size <= 1:
            return buf, lengths
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        ndev = mesh.devices.size
        if buf.shape[0] % ndev:
            pad = ndev - buf.shape[0] % ndev
            buf = np.pad(buf, ((0, pad), (0, 0)))
            lengths = np.pad(lengths, (0, pad))
        spec = PartitionSpec(tuple(mesh.axis_names))
        shard = NamedSharding(mesh, spec)
        return (
            jax.device_put(buf, shard),
            jax.device_put(lengths, shard),
        )

    def _program_many(self, chunks):
        """Run the compiled program over a list of packed chunks; engines
        may override to batch same-shape chunks into one dispatch."""
        return [
            self._program(*self._shard_chunk(buf, lengths))
            for buf, lengths, _ in chunks
        ]

    def _apply_patches(self, prepared: bytes, row_ids, recs):
        """Splice host-encoded ids for flagged words into a device row.

        `recs`: patch records (row, col, wlen, tok_off, tok_cnt) for this
        row in ascending tok_off order — the device encoded the row but
        flagged these words (near-tie, overlong, dropped); the host
        re-encodes each word's bytes and replaces the device's tok_cnt
        tokens at tok_off.  Engines that emit patch records override
        `_encode_word_host`; returning None falls back to whole-row host
        re-encode."""
        parts = []
        cur = 0
        for rec in recs:
            _r, col, wlen, ooff, kw = (int(x) for x in rec[:5])
            word_ids = self._encode_word_host(prepared, col, wlen)
            if word_ids is None or ooff < cur or ooff + kw > len(row_ids):
                return None
            parts.append(row_ids[cur:ooff])
            parts.append(np.asarray(word_ids, np.int32))
            cur = ooff + kw
        parts.append(row_ids[cur:])
        return np.concatenate(parts) if len(parts) > 1 else parts[0]

    def _encode_word_host(self, prepared: bytes, col: int, wlen: int):
        """Host-exact ids for ONE flagged word (engine-specific: `col` and
        `wlen` address the engine's device text space).  None = cannot
        patch (row falls back to the host pipeline)."""
        return None

    def _run_device(self, byte_strings: List[bytes]):
        """-> (results: per-input np.int32 ids or None, bad: input indices)."""
        results: List[Optional[np.ndarray]] = [None] * len(byte_strings)
        bad: List[int] = []
        chunks = pack_batch(byte_strings)
        for (_buf, _lengths, orig), out in zip(
            chunks, self._program_many(chunks)
        ):
            ids, ntok, row_bad = out[:3]
            ids = np.asarray(ids)
            ntok = np.asarray(ntok)
            row_bad = np.asarray(row_bad)
            row_patches: dict = {}
            if len(out) > 3 and out[3] is not None:
                ptab, nflag = out[3]
                n = int(nflag)
                if n > 0:
                    ptab = np.asarray(ptab)
                    if n <= ptab.shape[0]:  # overflow already row-flagged
                        for rec in ptab[:n]:
                            row_patches.setdefault(int(rec[0]), []).append(
                                rec
                            )
            for r, i in enumerate(orig):
                if row_bad[r]:
                    bad.append(i)
                    continue
                row_ids = ids[r, : ntok[r]]
                recs = row_patches.get(r)
                if recs:
                    row_ids = self._apply_patches(
                        byte_strings[i], row_ids, recs
                    )
                    STATS.patched_words += len(recs)
                    if row_ids is None:
                        bad.append(i)
                        continue
                results[i] = row_ids
        STATS.device_rows += len(byte_strings)
        STATS.bad_rows += len(bad)
        return results, bad

    def encode_batch(
        self, inputs: List[str], add_special_tokens: bool
    ) -> List[Encoding]:
        added = list(self.tokenizer.added_vocabulary.added_tokens_map)
        encodings: List[Optional[Encoding]] = [None] * len(inputs)
        piece_strings: List[bytes] = []  # flattened device work items
        piece_owner: List[int] = []  # input index per work item
        host_idx: List[int] = []

        for i, s in enumerate(inputs):
            if self._needs_host(s, added):
                host_idx.append(i)
                continue
            data = self._prepare(s)
            if len(data) > MAX_L // 2:
                chunks = self._split_long(data, CHUNK_TARGET)
                if len(chunks) == 1:  # no safe seam: host path
                    host_idx.append(i)
                    continue
            else:
                chunks = [data]
            for c in chunks:
                piece_strings.append(c)
                piece_owner.append(i)

        STATS.total_inputs += len(inputs)
        STATS.host_pre_inputs += len(host_idx)
        if piece_strings:
            results, bad = self._run_device(piece_strings)
            bad_inputs = {piece_owner[j] for j in bad}
            per_input: dict = {}
            for j, ids in enumerate(results):
                owner = piece_owner[j]
                if owner in bad_inputs or ids is None:
                    continue
                per_input.setdefault(owner, []).append(ids)
            for i, parts in per_input.items():
                ids = np.concatenate(parts) if len(parts) > 1 else parts[0]
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
            host_idx.extend(sorted(bad_inputs))

        for i in host_idx:
            encodings[i] = self.tokenizer._encode(
                inputs[i], None, add_special_tokens, "none"
            )
        return encodings

    # -------------------------------------------------------- with offsets

    def _run_device_offsets(self, byte_strings: List[bytes]):
        results: List[Optional[tuple]] = [None] * len(byte_strings)
        bad: List[int] = []
        for buf, lengths, orig in pack_batch(byte_strings):
            ids, ntok, row_bad, starts, ends, words = self._program_offsets(
                buf, lengths
            )  # words: word ids (BPE) or dense word ranks (WordPiece)
            ids = np.asarray(ids)
            ntok = np.asarray(ntok)
            row_bad = np.asarray(row_bad)
            starts = np.asarray(starts)
            ends = np.asarray(ends)
            words = np.asarray(words)
            for r, i in enumerate(orig):
                if row_bad[r]:
                    bad.append(i)
                else:
                    n = ntok[r]
                    results[i] = (
                        ids[r, :n],
                        starts[r, :n],
                        ends[r, :n],
                        words[r, :n],
                    )
        STATS.device_rows += len(byte_strings)
        STATS.bad_rows += len(bad)
        return results, bad

    def encode_batch_offsets(
        self, inputs: List[str], add_special_tokens: bool, char_ref: bool
    ) -> List[Encoding]:
        """Device encode with original-referential offsets (byte or char),
        token strings and word indices — the reference `encode_batch` /
        `encode_batch_char_offsets` surface."""
        added = list(self.tokenizer.added_vocabulary.added_tokens_map)
        encodings: List[Optional[Encoding]] = [None] * len(inputs)
        piece_strings: List[bytes] = []
        piece_owner: List[int] = []
        piece_base: List[int] = []  # prepared-space byte base per piece
        host_idx: List[int] = []
        offsets_kind = "char" if char_ref else "byte"

        input_ns: dict = {}
        for i, s in enumerate(inputs):
            if self._needs_host(s, added):
                host_idx.append(i)
                continue
            if self.offsets_space == "normalized_bytes":
                data, ns = self._prepare_aligned(s)
                input_ns[i] = ns
            else:
                data = self._prepare(s)
            if len(data) > MAX_L // 2:
                chunks = self._split_long(data, CHUNK_TARGET)
                if len(chunks) == 1:
                    host_idx.append(i)
                    continue
            else:
                chunks = [data]
            bbase = cbase = 0
            for c in chunks:
                piece_strings.append(c)
                piece_owner.append(i)
                piece_base.append((bbase, cbase))
                bbase += len(c)
                cbase += len(c.decode("utf-8"))

        STATS.total_inputs += len(inputs)
        STATS.host_pre_inputs += len(host_idx)
        if piece_strings:
            results, bad = self._run_device_offsets(piece_strings)
            bad_inputs = {piece_owner[j] for j in bad}
            per_input: dict = {}
            for j, res in enumerate(results):
                owner = piece_owner[j]
                if owner in bad_inputs or res is None:
                    continue
                ids, st, en, wd = res
                bbase, cbase = piece_base[j]
                base = (
                    cbase if self.offsets_space == "original_chars" else bbase
                )
                per_input.setdefault(owner, []).append(
                    (ids, st + base, en + base, wd)
                )
            for i, parts in per_input.items():
                if len(parts) > 1:
                    ids = np.concatenate([p[0] for p in parts])
                    st = np.concatenate([p[1] for p in parts])
                    en = np.concatenate([p[2] for p in parts])
                    wds = []
                    wbase = 0
                    for p in parts:
                        wds.append(p[3] + wbase)
                        if len(p[3]):
                            wbase += int(p[3].max()) + 1
                    wd = np.concatenate(wds)
                else:
                    ids, st, en, wd = parts[0]
                st_c = en_c = None
                if self.offsets_space == "prepared_bytes":
                    # prepared -> original bytes (undo the prefix space)
                    if self.add_prefix_space and not inputs[i].startswith(" "):
                        st = np.maximum(st - 1, 0)
                        en = np.maximum(en - 1, 0)
                    if char_ref:
                        st, en = _bytes_to_chars(inputs[i], st, en)
                    else:
                        st, en = _expand_bytes(inputs[i], st, en)
                elif self.offsets_space == "normalized_bytes":
                    # normalized-byte spans -> original-byte spans through
                    # the alignments (convert_offsets: span start from the
                    # first byte's alignment, end from the last byte's)
                    ns = input_ns.get(i)
                    if ns is not None and len(ns.alignments):
                        a = np.asarray(ns.alignments, np.int64).reshape(-1, 2)
                        nb = len(a)
                        st0 = a[np.clip(st, 0, nb - 1), 0]
                        en0 = np.where(
                            en > st, a[np.clip(en - 1, 0, nb - 1), 1], st0
                        )
                        st, en = st0, en0
                    if char_ref:
                        st, en = _bytes_to_chars(inputs[i], st, en)
                    else:
                        st, en = _expand_bytes(inputs[i], st, en)
                else:  # original_chars
                    st_c, en_c = st, en
                    if not char_ref:
                        st, en = _chars_to_bytes(inputs[i], st, en)
                n = len(ids)
                idl = ids.tolist()
                enc = Encoding(
                    ids=idl,
                    type_ids=[0] * n,
                    tokens=self._token_strings(
                        idl,
                        inputs[i],
                        st if st_c is None else st_c,
                        en if en_c is None else en_c,
                    ),
                    words=wd.tolist(),
                    offsets=list(zip(st.tolist(), en.tolist())),
                )
                encodings[i] = self.tokenizer.post_process(
                    enc, None, add_special_tokens
                )
            host_idx.extend(sorted(bad_inputs))

        for i in host_idx:
            encodings[i] = self.tokenizer._encode(
                inputs[i], None, add_special_tokens, offsets_kind
            )
        return encodings

    def _token_strings(self, ids, text, st_c, en_c):
        """Token strings per id; `st_c`/`en_c` are char-referential spans
        (engines with text-dependent token values override this)."""
        model = self.tokenizer.model
        if hasattr(model, "vocab_r"):
            vr = model.vocab_r
            return [vr[t] for t in ids]
        return [model.id_to_token(t) for t in ids]

    def encode_batch_arrays(self, inputs: List[str]):
        """Device-resident (ids, ntok, orig_indices) per packed chunk — the
        serving path: token ids never leave the device.

        Long documents are split at tokenization-safe seams like
        `encode_batch`, so one input may appear in several chunks (its
        per-chunk token streams concatenate exactly, in orig order).  An
        oversized input with no safe seam raises ValueError — this path
        has no host fallback by design."""
        byte_strings: List[bytes] = []
        owners: List[int] = []
        for i, s in enumerate(inputs):
            data = self._prepare(s)
            if len(data) > MAX_L // 2:
                chunks = self._split_long(data, CHUNK_TARGET)
                if len(chunks) == 1:
                    raise ValueError(
                        f"input {i} is {len(data)} bytes with no "
                        f"tokenization-safe split seam (> MAX_L//2 = "
                        f"{MAX_L // 2}); use encode_batch for host fallback"
                    )
            else:
                chunks = [data]
            for c in chunks:
                byte_strings.append(c)
                owners.append(i)
        out = []
        chunks = pack_batch(byte_strings)
        for (_buf, _lengths, orig), res in zip(
            chunks, self._program_many(chunks)
        ):
            ids, ntok = res[0], res[1]
            out.append((ids, ntok, [owners[j] for j in orig]))
        return out
