"""Models: the tokenization algorithms (BPE, WordPiece, WordLevel, Unigram).

Host-exact implementations define the semantics (and serve the long tail of
configurations); the batched TPU kernels in `tokenizers_tpu.ops` implement the
same semantics over packed byte tensors for the hot paths.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ..pretokenized import Token


class Model:
    """Base interface (reference `tokenizers/src/tokenizer/mod.rs:70-90`)."""

    def tokenize(self, sequence: str) -> List[Token]:
        raise NotImplementedError

    def token_to_id(self, token: str) -> Optional[int]:
        raise NotImplementedError

    def id_to_token(self, id: int) -> Optional[str]:
        raise NotImplementedError

    def get_vocab(self) -> Dict[str, int]:
        raise NotImplementedError

    def get_vocab_size(self) -> int:
        return len(self.get_vocab())

    def save(self, folder: str, prefix: Optional[str] = None) -> List[str]:
        raise NotImplementedError

    def get_trainer(self):
        raise NotImplementedError


from .bpe import BPE  # noqa: E402
from .wordpiece import WordPiece  # noqa: E402
from .wordlevel import WordLevel  # noqa: E402
from .unigram import Unigram  # noqa: E402

__all__ = ["Model", "BPE", "WordPiece", "WordLevel", "Unigram"]
