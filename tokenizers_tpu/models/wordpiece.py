"""WordPiece model: greedy longest-match-first subword tokenization.

Host-exact implementation of reference
`tokenizers/src/models/wordpiece/mod.rs:224-283`: scan char boundaries from the
longest candidate down, `##` continuation prefix, whole-word `[UNK]` on any
failure or when the word exceeds `max_input_chars_per_word` chars.

The batched TPU kernel lives in `ops/wordpiece_encode.py`.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from ..pretokenized import Token
from . import Model


class WordPiece(Model):
    def __init__(
        self,
        vocab: Optional[Dict[str, int]] = None,
        unk_token: str = "[UNK]",
        continuing_subword_prefix: str = "##",
        max_input_chars_per_word: int = 100,
    ):
        self.vocab: Dict[str, int] = dict(vocab or {})
        self.vocab_r: Dict[int, str] = {v: k for k, v in self.vocab.items()}
        self.unk_token = unk_token
        self.continuing_subword_prefix = continuing_subword_prefix
        self.max_input_chars_per_word = max_input_chars_per_word

    # ------------------------------------------------------------------ files

    @staticmethod
    def read_file(vocab_path: str) -> Dict[str, int]:
        vocab: Dict[str, int] = {}
        with open(vocab_path, "r", encoding="utf-8") as f:
            for i, line in enumerate(f):
                token = line.rstrip("\n")
                vocab[token] = i
        return vocab

    @classmethod
    def from_file(cls, vocab_path: str, **kwargs) -> "WordPiece":
        return cls(cls.read_file(vocab_path), **kwargs)

    @classmethod
    def from_bpe(cls, bpe) -> "WordPiece":
        wp = cls(
            bpe.get_vocab(),
            unk_token=bpe.unk_token or "[UNK]",
            continuing_subword_prefix=bpe.continuing_subword_prefix or "##",
        )
        return wp

    # --------------------------------------------------------------- tokenize

    def tokenize(self, sequence: str) -> List[Token]:
        chars = list(sequence)
        char_len = len(chars)
        if char_len > self.max_input_chars_per_word:
            unk_id = self.vocab.get(self.unk_token)
            if unk_id is None:
                raise ValueError(f"Missing [UNK] token from the vocabulary: {self.unk_token!r}")
            return [Token(unk_id, self.unk_token, (0, len(sequence.encode("utf-8"))))]

        # byte offset of each char boundary
        byte_off = [0]
        for c in chars:
            byte_off.append(byte_off[-1] + len(c.encode("utf-8")))

        is_bad = False
        start = 0
        sub_tokens: List[Token] = []
        while start < char_len:
            end = char_len
            cur: Optional[Token] = None
            while start < end:
                substr = sequence if (start == 0 and end == char_len) else "".join(
                    chars[start:end]
                )
                if start > 0:
                    substr = self.continuing_subword_prefix + substr
                id = self.vocab.get(substr)
                if id is not None:
                    cur = Token(id, substr, (byte_off[start], byte_off[end]))
                    break
                end -= 1
            if cur is None:
                is_bad = True
                break
            sub_tokens.append(cur)
            start = end

        if is_bad:
            unk_id = self.vocab.get(self.unk_token)
            if unk_id is None:
                raise ValueError(f"Missing [UNK] token from the vocabulary: {self.unk_token!r}")
            return [Token(unk_id, self.unk_token, (0, len(sequence.encode("utf-8"))))]
        return sub_tokens

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
        name = f"{prefix}-vocab.txt" if prefix else "vocab.txt"
        path = os.path.join(folder, name)
        with open(path, "w", encoding="utf-8") as f:
            for i in sorted(self.vocab_r):
                f.write(self.vocab_r[i] + "\n")
        return [path]

    def get_trainer(self):
        from ..trainers.wordpiece_trainer import WordPieceTrainer

        return WordPieceTrainer()
