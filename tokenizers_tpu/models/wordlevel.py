"""WordLevel model: exact token -> id lookup with unk fallback.

Reference `tokenizers/src/models/wordlevel/mod.rs:99-180`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from ..pretokenized import Token
from . import Model


class WordLevel(Model):
    def __init__(self, vocab: Optional[Dict[str, int]] = None, unk_token: str = "<unk>"):
        self.vocab: Dict[str, int] = dict(vocab or {})
        self.vocab_r: Dict[int, str] = {v: k for k, v in self.vocab.items()}
        self.unk_token = unk_token

    @staticmethod
    def read_file(vocab_path: str) -> Dict[str, int]:
        with open(vocab_path, "r", encoding="utf-8") as f:
            return json.load(f)

    @classmethod
    def from_file(cls, vocab_path: str, **kwargs) -> "WordLevel":
        return cls(cls.read_file(vocab_path), **kwargs)

    def tokenize(self, sequence: str) -> List[Token]:
        id = self.vocab.get(sequence)
        if id is not None:
            return [Token(id, sequence, (0, len(sequence.encode("utf-8"))))]
        unk_id = self.vocab.get(self.unk_token)
        if unk_id is None:
            raise ValueError(f"Missing unk token from the vocabulary: {self.unk_token!r}")
        return [Token(unk_id, self.unk_token, (0, len(sequence.encode("utf-8"))))]

    def token_to_id(self, token: str) -> Optional[int]:
        return self.vocab.get(token)

    def id_to_token(self, id: int) -> Optional[str]:
        return self.vocab_r.get(id)

    def get_vocab(self) -> Dict[str, int]:
        return dict(self.vocab)

    def get_vocab_size(self) -> int:
        return len(self.vocab)

    def save(self, folder: str, prefix: Optional[str] = None) -> List[str]:
        name = f"{prefix}-vocab.json" if prefix else "vocab.json"
        path = os.path.join(folder, name)
        with open(path, "w", encoding="utf-8") as f:
            ordered = {self.vocab_r[i]: i for i in sorted(self.vocab_r)}
            json.dump(ordered, f, ensure_ascii=False)
        return [path]

    def get_trainer(self):
        from ..trainers.wordlevel_trainer import WordLevelTrainer

        return WordLevelTrainer()
