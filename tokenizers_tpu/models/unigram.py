"""Unigram (SentencePiece) model: max-likelihood Viterbi segmentation.

Host-exact implementation of reference
`tokenizers/src/models/unigram/model.rs`: forward DP over byte positions
(`encode_optimized`, mirroring SPM `unigram_model.cc`), shortest-first prefix
matching with first-updater-wins tie-breaking, `K_UNK_PENALTY = 10.0` below
`min_score`, unk fusion, and `<0xXX>` byte fallback.

The batched TPU Viterbi kernel lives in `ops/unigram_encode.py`.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, List, Optional, Tuple

from ..pretokenized import Token
from ..utils.cache import Cache
from . import Model

K_UNK_PENALTY = 10.0
MAX_CACHEABLE_LENGTH = 256


class Unigram(Model):
    def __init__(
        self,
        vocab: Optional[List[Tuple[str, float]]] = None,
        unk_id: Optional[int] = None,
        byte_fallback: bool = False,
    ):
        if vocab is None:
            vocab = [("<unk>", 0.0)]
            unk_id = 0
        if unk_id is not None:
            if not vocab:
                raise ValueError("The vocabulary is empty but at least <unk> is needed")
            if unk_id >= len(vocab):
                raise ValueError("The `unk_id` is larger than vocabulary size")
        self.vocab: List[Tuple[str, float]] = [(t, float(s)) for t, s in vocab]
        self.unk_id = unk_id
        self.byte_fallback = byte_fallback
        self.fuse_unk = True
        self.is_optimized = True
        self.bos_id = len(vocab) + 1
        self.eos_id = len(vocab) + 2

        self.token_to_ids: Dict[str, int] = {}
        self.min_score = math.inf
        pieces_bytes: Dict[bytes, float] = {}
        for i, (token, score) in enumerate(self.vocab):
            self.token_to_ids[token] = i
            if score < self.min_score:
                self.min_score = score
        # byte-keyed piece table for prefix search
        self._piece_scores: Dict[bytes, Tuple[int, float]] = {}
        self._max_piece_len = 1
        for token, score in self.vocab:
            b = token.encode("utf-8")
            # last duplicate wins, matching reference token_to_ids overwrite
            self._piece_scores[b] = (self.token_to_ids[token], score)
            if len(b) > self._max_piece_len:
                self._max_piece_len = len(b)
        self.cache: Cache = Cache(10_000)

    # -------------------------------------------------------------- encoding

    def encode(self, sentence: str) -> List[str]:
        if not sentence:
            return []
        hit = self.cache.get(sentence)
        if hit is not None:
            return list(hit)
        if self.is_optimized:
            result = self._encode_optimized(sentence)
        else:
            result = self._encode_unoptimized(sentence)
        if len(sentence.encode("utf-8")) < MAX_CACHEABLE_LENGTH:
            self.cache.set(sentence, list(result))
        return result

    def _encode_optimized(self, sentence: str) -> List[str]:
        """Forward DP over byte positions
        (reference `unigram/model.rs:240-329`)."""
        sb = sentence.encode("utf-8")
        size = len(sb)
        unk_score = self.min_score - K_UNK_PENALTY
        if self.unk_id is None:
            unk_sentinel = None
        else:
            unk_sentinel = self.unk_id

        # per byte position: (id, best_path_score, starts_at)
        node_id = [0] * (size + 1)
        node_score = [0.0] * (size + 1)
        node_start: List[Optional[int]] = [None] * (size + 1)

        # char lengths in bytes at each position
        starts_at = 0
        piece_scores = self._piece_scores
        max_len = self._max_piece_len
        while starts_at < size:
            score_here = node_score[starts_at]
            b0 = sb[starts_at]
            if b0 < 0x80:
                mblen = 1
            elif b0 < 0xE0:
                mblen = 2
            elif b0 < 0xF0:
                mblen = 3
            else:
                mblen = 4
            has_single_node = False
            limit = min(max_len, size - starts_at)
            for n in range(1, limit + 1):
                entry = piece_scores.get(sb[starts_at : starts_at + n])
                if entry is None:
                    continue
                pid, pscore = entry
                key_pos = starts_at + n
                candidate = pscore + score_here
                if node_start[key_pos] is None or candidate > node_score[key_pos]:
                    node_score[key_pos] = candidate
                    node_start[key_pos] = starts_at
                    node_id[key_pos] = pid
                if not has_single_node and n == mblen:
                    has_single_node = True
            if not has_single_node:
                if unk_sentinel is None:
                    raise ValueError("Encountered an unknown token but `unk_id` is missing")
                key_pos = starts_at + mblen
                candidate = unk_score + score_here
                if node_start[key_pos] is None or candidate > node_score[key_pos]:
                    node_score[key_pos] = candidate
                    node_start[key_pos] = starts_at
                    node_id[key_pos] = unk_sentinel
            starts_at += mblen

        # backtrack, fusing unk
        ends_at = size
        results: List[str] = []
        token_parts: List[str] = []
        while ends_at > 0:
            s = node_start[ends_at]
            piece = sb[s:ends_at].decode("utf-8")
            if self.fuse_unk and self.unk_id is not None and node_id[ends_at] == self.unk_id:
                token_parts.append(piece)
            else:
                if token_parts:
                    token_parts.reverse()
                    results.append("".join(token_parts))
                    token_parts = []
                results.append(piece)
            ends_at = s
        if token_parts:
            token_parts.reverse()
            results.append("".join(token_parts))
        results.reverse()
        return results

    def _encode_unoptimized(self, sentence: str) -> List[str]:
        from .unigram_lattice import Lattice

        lattice = Lattice(sentence, self.bos_id, self.eos_id)
        self.populate_nodes(lattice)
        if self.fuse_unk:
            results: List[str] = []
            token = ""
            for node in lattice.viterbi():
                item = lattice.piece(node)
                if self.unk_id is None:
                    raise ValueError("Encountered an unknown token but `unk_id` is missing")
                if node.id == self.unk_id:
                    token += item
                else:
                    if token:
                        results.append(token)
                        token = ""
                    results.append(item)
            if token:
                results.append(token)
            return results
        return lattice.tokens()

    def populate_nodes(self, lattice) -> None:
        """Insert all vocab pieces (and unk single-char nodes) into a lattice
        (reference `unigram/model.rs:160-199`)."""
        unk_score = self.min_score - K_UNK_PENALTY
        sb = lattice.sentence_bytes
        size = len(sb)
        begin_pos = 0
        while begin_pos < size:
            b0 = sb[begin_pos]
            if b0 < 0x80:
                mblen = 1
            elif b0 < 0xE0:
                mblen = 2
            elif b0 < 0xF0:
                mblen = 3
            else:
                mblen = 4
            has_single_node = False
            limit = min(self._max_piece_len, size - begin_pos)
            for n in range(1, limit + 1):
                entry = self._piece_scores.get(sb[begin_pos : begin_pos + n])
                if entry is None:
                    continue
                pid, pscore = entry
                lattice.insert(begin_pos, n, pscore, pid)
                if not has_single_node and n == mblen:
                    has_single_node = True
            if not has_single_node and self.unk_id is not None:
                lattice.insert(begin_pos, mblen, unk_score, self.unk_id)
            begin_pos += mblen

    # --------------------------------------------------------------- tokenize

    def tokenize(self, sentence: str) -> List[Token]:
        str_tokens = self.encode(sentence)
        offset = 0
        tokens: List[Token] = []
        for string in str_tokens:
            ln = len(string.encode("utf-8"))
            offsets = (offset, offset + ln)
            id = self.token_to_ids.get(string)
            if id is None:
                if self.byte_fallback:
                    byte_tokens = []
                    ok = True
                    for byte in string.encode("utf-8"):
                        byte_string = "<0x%02X>" % byte
                        bid = self.token_to_ids.get(byte_string)
                        if bid is None:
                            ok = False
                            break
                        byte_tokens.append(Token(bid, byte_string, offsets))
                    if ok:
                        tokens.extend(byte_tokens)
                        offset += ln
                        continue
                if self.unk_id is None:
                    raise ValueError("Encountered an unknown token but `unk_id` is missing")
                id = self.unk_id
            offset += ln
            tokens.append(Token(id, string, offsets))
        return tokens

    # -------------------------------------------------------------- accessors

    def token_to_id(self, token: str) -> Optional[int]:
        return self.token_to_ids.get(token)

    def id_to_token(self, id: int) -> Optional[str]:
        if 0 <= id < len(self.vocab):
            return self.vocab[id][0]
        return None

    def get_vocab(self) -> Dict[str, int]:
        return dict(self.token_to_ids)

    def get_vocab_size(self) -> int:
        return len(self.vocab)

    def clear_cache(self) -> None:
        self.cache.clear()

    def save(self, folder: str, prefix: Optional[str] = None) -> List[str]:
        name = f"{prefix}-unigram.json" if prefix else "unigram.json"
        path = os.path.join(folder, name)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "type": "Unigram",
                    "unk_id": self.unk_id,
                    "vocab": [[t, s] for t, s in self.vocab],
                    "byte_fallback": self.byte_fallback,
                },
                f,
                ensure_ascii=False,
                indent=2,
            )
        return [path]

    def get_trainer(self):
        from ..trainers.unigram_trainer import UnigramTrainer

        return UnigramTrainer()
