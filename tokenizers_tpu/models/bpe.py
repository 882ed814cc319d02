"""Byte-Pair Encoding model: greedy lowest-rank-first pair merging.

Host-exact implementation of the semantics of reference
`tokenizers/src/models/bpe/{model,word}.rs`: min-(rank, pos) merge order with
stale-entry revalidation, `continuing_subword_prefix` / `end_of_word_suffix`,
`byte_fallback` (`<0xXX>` pieces), unk fusion, `ignore_merges` whole-word
bypass, BPE-dropout, and a bounded word-level cache.

The batched TPU kernel (`ops/bpe_encode.py`) implements the same merge
semantics over packed byte tensors; it requires a *well-formed* merge table
(every merge producing token t has lower rank than merges consuming t — true
for any table produced by BPE training) and is validated against this
implementation in tests.
"""

from __future__ import annotations

import heapq
import json
import os
import random
from typing import Dict, Iterable, List, Optional, Tuple

from ..pretokenized import Token
from ..utils.cache import Cache
from ..errors import ModelError
from . import Model

DEFAULT_CACHE_CAPACITY = 10_000
MAX_CACHEABLE_LENGTH = 256  # reference utils/cache.rs:10


def _utf8_len(c: str) -> int:
    cp = ord(c)
    if cp < 0x80:
        return 1
    if cp < 0x800:
        return 2
    if cp < 0x10000:
        return 3
    return 4


class _Word:
    """Symbol list + merge loop (reference `models/bpe/word.rs`).

    Symbols are (id, byte_len) with tombstoned removals (byte_len == 0).
    """

    __slots__ = ("ids", "lens", "prev", "next")

    def __init__(self):
        self.ids: List[int] = []
        self.lens: List[int] = []
        self.prev: List[int] = []
        self.next: List[int] = []

    def add(self, id: int, byte_len: int) -> None:
        n = len(self.ids)
        if n > 0:
            self.next[n - 1] = n
        self.ids.append(id)
        self.lens.append(byte_len)
        self.prev.append(n - 1)
        self.next.append(-1)

    def merge_all(
        self,
        merges: Dict[Tuple[int, int], Tuple[int, int]],
        dropout: Optional[float] = None,
    ) -> None:
        ids, lens, prev, nxt = self.ids, self.lens, self.prev, self.next
        heap: List[Tuple[int, int, int]] = []  # (rank, pos, new_id)
        for i in range(len(ids) - 1):
            m = merges.get((ids[i], ids[i + 1]))
            if m is not None:
                heap.append((m[0], i, m[1]))
        heapq.heapify(heap)
        skip: List[Tuple[int, int, int]] = []

        while heap:
            top = heapq.heappop(heap)
            if dropout is not None and dropout > 0.0 and random.random() < dropout:
                skip.append(top)
                continue
            for item in skip:
                heapq.heappush(heap, item)
            skip.clear()

            rank, pos, new_id = top
            if lens[pos] == 0:
                continue
            if nxt[pos] == -1:
                continue
            next_pos = nxt[pos]
            # revalidate against current state
            cur = merges.get((ids[pos], ids[next_pos]))
            if cur is None or cur[1] != new_id:
                continue
            # merge
            ids[pos] = new_id
            lens[pos] += lens[next_pos]
            right_next = nxt[next_pos]
            nxt[pos] = right_next
            lens[next_pos] = 0
            if right_next > -1:
                prev[right_next] = pos
            # new pair with previous symbol
            if prev[pos] >= 0:
                p = prev[pos]
                m = merges.get((ids[p], ids[pos]))
                if m is not None:
                    heapq.heappush(heap, (m[0], p, m[1]))
            # new pair with next symbol
            if right_next > -1:
                m = merges.get((ids[pos], ids[right_next]))
                if m is not None:
                    heapq.heappush(heap, (m[0], pos, m[1]))

    def tokens(self) -> List[Tuple[int, Tuple[int, int]]]:
        out = []
        pos = 0
        for id, ln in zip(self.ids, self.lens):
            if ln == 0:
                continue
            out.append((id, (pos, pos + ln)))
            pos += ln
        return out


class BPE(Model):
    def __init__(
        self,
        vocab: Optional[Dict[str, int]] = None,
        merges: Optional[List[Tuple[str, str]]] = None,
        cache_capacity: int = DEFAULT_CACHE_CAPACITY,
        dropout: Optional[float] = None,
        unk_token: Optional[str] = None,
        continuing_subword_prefix: Optional[str] = None,
        end_of_word_suffix: Optional[str] = None,
        fuse_unk: bool = False,
        byte_fallback: bool = False,
        ignore_merges: bool = False,
    ):
        self.vocab: Dict[str, int] = dict(vocab or {})
        self.vocab_r: Dict[int, str] = {v: k for k, v in self.vocab.items()}
        self.dropout = dropout
        self.unk_token = unk_token
        self.continuing_subword_prefix = continuing_subword_prefix
        self.end_of_word_suffix = end_of_word_suffix
        self.fuse_unk = fuse_unk
        self.byte_fallback = byte_fallback
        self.ignore_merges = ignore_merges
        self.cache: Optional[Cache] = (
            Cache(cache_capacity) if cache_capacity > 0 else None
        )
        self.merges_list: List[Tuple[str, str]] = list(merges or [])
        self.merges: Dict[Tuple[int, int], Tuple[int, int]] = self._build_merge_map(
            self.merges_list
        )

    def _build_merge_map(
        self, merges: List[Tuple[str, str]]
    ) -> Dict[Tuple[int, int], Tuple[int, int]]:
        """(id,id) -> (rank, new_id); reference `models/bpe/model.rs:174-192`."""
        prefix_len = (
            len(self.continuing_subword_prefix.encode("utf-8"))
            if self.continuing_subword_prefix
            else 0
        )
        merge_map: Dict[Tuple[int, int], Tuple[int, int]] = {}
        for i, (a, b) in enumerate(merges):
            if a not in self.vocab:
                raise ModelError(f"Merge token out of vocabulary: {a!r}")
            if b not in self.vocab:
                raise ModelError(f"Merge token out of vocabulary: {b!r}")
            new_token = a + b.encode("utf-8")[prefix_len:].decode("utf-8")
            if new_token not in self.vocab:
                raise ModelError(f"Merge token out of vocabulary: {new_token!r}")
            merge_map[(self.vocab[a], self.vocab[b])] = (i, self.vocab[new_token])
        return merge_map

    # ------------------------------------------------------------------ files

    @staticmethod
    def read_file(vocab_path: str, merges_path: str):
        with open(vocab_path, "r", encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_path, "r", encoding="utf-8") as f:
            for i, line in enumerate(f):
                line = line.rstrip("\n")
                if i == 0 and line.startswith("#version"):
                    continue
                if not line:
                    continue
                parts = line.split(" ")
                if len(parts) != 2:
                    raise ModelError(f"Invalid merges line: {line!r}")
                merges.append((parts[0], parts[1]))
        return vocab, merges

    @classmethod
    def from_file(cls, vocab_path: str, merges_path: str, **kwargs) -> "BPE":
        vocab, merges = cls.read_file(vocab_path, merges_path)
        return cls(vocab, merges, **kwargs)

    # --------------------------------------------------------------- tokenize

    def _merge_word(self, w: str) -> _Word:
        word = _Word()
        unk: Optional[Tuple[int, int]] = None  # (unk_id, unk_len)
        chars = list(w)
        n = len(chars)
        for idx, c in enumerate(chars):
            is_first = idx == 0
            is_last = idx == n - 1
            s = c
            byte_len = _utf8_len(c)
            if not is_first and self.continuing_subword_prefix:
                s = self.continuing_subword_prefix + s
            if is_last and self.end_of_word_suffix:
                s = s + self.end_of_word_suffix

            id = self.vocab.get(s)
            if id is not None:
                if unk is not None:
                    word.add(unk[0], unk[1])
                    unk = None
                word.add(id, byte_len)
                continue

            if self.byte_fallback:
                bs = s.encode("utf-8")
                codes = [self.vocab.get("<0x%02X>" % b) for b in bs]
                if all(t is not None for t in codes):
                    # NB: reference does NOT flush a pending unk here
                    # (models/bpe/model.rs:419-433) — keep the same quirk.
                    for t in codes:
                        word.add(t, 1)
                    continue

            if self.unk_token is not None:
                unk_id = self.vocab.get(self.unk_token)
                if unk_id is None:
                    raise ModelError(
                        f"Unk token `{self.unk_token}` is out of vocabulary"
                    )
                if unk is not None and self.fuse_unk:
                    unk = (unk[0], unk[1] + byte_len)
                elif unk is not None:
                    word.add(unk[0], unk[1])
                    unk = (unk_id, byte_len)
                else:
                    unk = (unk_id, byte_len)

        if unk is not None:
            word.add(unk[0], unk[1])

        word.merge_all(self.merges, self.dropout)
        return word

    def _word_to_tokens(self, word: _Word) -> List[Token]:
        return [
            Token(id, self.vocab_r[id], offsets) for id, offsets in word.tokens()
        ]

    def tokenize(self, sequence: str) -> List[Token]:
        if not sequence:
            return []
        if self.dropout is None or self.dropout == 0.0:
            return self._tokenize_with_cache(sequence)
        word = self._merge_word(sequence)
        return self._word_to_tokens(word)

    def _tokenize_with_cache(self, sequence: str) -> List[Token]:
        if self.ignore_merges:
            id = self.vocab.get(sequence)
            if id is not None:
                return [Token(id, sequence, (0, len(sequence.encode("utf-8"))))]
        if self.cache is not None:
            hit = self.cache.get(sequence)
            if hit is not None:
                return self._word_to_tokens(hit)
        word = self._merge_word(sequence)
        ret = self._word_to_tokens(word)
        if self.cache is not None and len(sequence) < MAX_CACHEABLE_LENGTH:
            self.cache.set(sequence, word)
        return ret

    def clear_cache(self) -> None:
        if self.cache is not None:
            self.cache.clear()

    # -------------------------------------------------------------- accessors

    def token_to_id(self, token: str) -> Optional[int]:
        return self.vocab.get(token)

    def id_to_token(self, id: int) -> Optional[str]:
        return self.vocab_r.get(id)

    def get_vocab(self) -> Dict[str, int]:
        return dict(self.vocab)

    def get_vocab_size(self) -> int:
        return len(self.vocab)

    def save(self, folder: str, prefix: Optional[str] = None) -> List[str]:
        vocab_name = f"{prefix}-vocab.json" if prefix else "vocab.json"
        merges_name = f"{prefix}-merges.txt" if prefix else "merges.txt"
        vocab_path = os.path.join(folder, vocab_name)
        merges_path = os.path.join(folder, merges_name)
        with open(vocab_path, "w", encoding="utf-8") as f:
            ordered = {self.vocab_r[i]: i for i in sorted(self.vocab_r)}
            holes = [
                i for i in range(len(self.vocab_r)) if i not in self.vocab_r
            ]
            if holes:
                # reference models/mod.rs:54 warns on vocab holes at save
                from ..utils.log import get_logger

                get_logger("models").warning(
                    "The OrderedVocab you are attempting to save contains "
                    "holes for indices %s, your vocabulary could be "
                    "corrupted !",
                    holes[:16],
                )
            json.dump(ordered, f, ensure_ascii=False)
        ranked = sorted(
            ((rank, pair) for pair, (rank, _) in self.merges.items()),
            key=lambda x: x[0],
        )
        with open(merges_path, "w", encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            for _, (a, b) in ranked:
                f.write(f"{self.vocab_r[a]} {self.vocab_r[b]}\n")
        return [vocab_path, merges_path]

    def get_trainer(self):
        from ..trainers.bpe_trainer import BpeTrainer

        return BpeTrainer()
