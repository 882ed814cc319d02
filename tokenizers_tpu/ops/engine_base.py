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


class DeviceEngineBase:
    tokenizer = None
    add_prefix_space = False

    # subclass provides: _program(buf, lengths) -> (ids, ntok, row_bad)

    def _prepare(self, s: str) -> bytes:
        if self.add_prefix_space and not s.startswith(" "):
            s = " " + s
        return s.encode("utf-8")

    def _run_device(self, byte_strings: List[bytes]):
        """-> (results: per-input np.int32 ids or None, bad: input indices)."""
        results: List[Optional[np.ndarray]] = [None] * len(byte_strings)
        bad: List[int] = []
        for buf, lengths, orig in pack_batch(byte_strings):
            ids, ntok, row_bad = self._program(buf, lengths)
            ids = np.asarray(ids)
            ntok = np.asarray(ntok)
            row_bad = np.asarray(row_bad)
            for r, i in enumerate(orig):
                if row_bad[r]:
                    bad.append(i)
                else:
                    results[i] = ids[r, : ntok[r]]
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
            if any(t in s for t in added):
                host_idx.append(i)
                continue
            data = self._prepare(s)
            if len(data) > MAX_L // 2:
                chunks = split_long(data, CHUNK_TARGET)
                if len(chunks) == 1:  # no safe seam: host path
                    host_idx.append(i)
                    continue
            else:
                chunks = [data]
            for c in chunks:
                piece_strings.append(c)
                piece_owner.append(i)

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

    def encode_batch_arrays(self, inputs: List[str]):
        """Device-resident (ids, ntok, orig_indices) per packed chunk — the
        serving path: token ids never leave the device."""
        byte_strings = [self._prepare(s) for s in inputs]
        out = []
        for buf, lengths, orig in pack_batch(byte_strings):
            ids, ntok, row_bad = self._program(buf, lengths)
            out.append((ids, ntok, orig))
        return out
