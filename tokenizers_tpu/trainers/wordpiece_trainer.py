"""WordPieceTrainer: thin wrapper over BpeTrainer with `##` prefix
(reference `tokenizers/src/models/wordpiece/trainer.rs`)."""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Set

from ..added_vocabulary import AddedToken
from ..models.bpe import BPE
from .bpe_trainer import BpeTrainer


class WordPieceTrainer:
    def __init__(
        self,
        vocab_size: int = 30000,
        min_frequency: int = 0,
        show_progress: bool = True,
        special_tokens: Optional[List] = None,
        limit_alphabet: Optional[int] = None,
        initial_alphabet: Optional[Set[str]] = None,
        continuing_subword_prefix: str = "##",
        end_of_word_suffix: Optional[str] = None,
    ):
        self.bpe_trainer = BpeTrainer(
            vocab_size=vocab_size,
            min_frequency=min_frequency,
            show_progress=show_progress,
            special_tokens=special_tokens,
            limit_alphabet=limit_alphabet,
            initial_alphabet=initial_alphabet,
            continuing_subword_prefix=continuing_subword_prefix,
            end_of_word_suffix=end_of_word_suffix,
        )

    @property
    def vocab_size(self):
        return self.bpe_trainer.vocab_size

    @property
    def special_tokens(self):
        return self.bpe_trainer.special_tokens

    def feed(self, iterator: Iterable[str], process: Callable[[str], List[str]]) -> None:
        self.bpe_trainer.feed(iterator, process)

    def train(self, model) -> List[AddedToken]:
        bpe = BPE(
            continuing_subword_prefix=self.bpe_trainer.continuing_subword_prefix,
            end_of_word_suffix=self.bpe_trainer.end_of_word_suffix,
            cache_capacity=0,
        )
        special_tokens = self.bpe_trainer.train(bpe)
        model.vocab = bpe.get_vocab()
        model.vocab_r = {v: k for k, v in model.vocab.items()}
        if self.bpe_trainer.continuing_subword_prefix is not None:
            model.continuing_subword_prefix = (
                self.bpe_trainer.continuing_subword_prefix
            )
        return special_tokens
