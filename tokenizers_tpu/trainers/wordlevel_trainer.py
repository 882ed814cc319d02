"""WordLevelTrainer (reference `tokenizers/src/models/wordlevel/trainer.rs`):
count words, min_frequency filter, sort by count desc then content asc."""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional

from ..added_vocabulary import AddedToken


class WordLevelTrainer:
    def __init__(
        self,
        vocab_size: int = 30000,
        min_frequency: int = 0,
        show_progress: bool = True,
        special_tokens: Optional[List] = None,
    ):
        self.vocab_size = vocab_size
        self.min_frequency = min_frequency
        self.show_progress = show_progress
        self.special_tokens = [
            t if isinstance(t, AddedToken) else AddedToken(t, special=True)
            for t in (special_tokens or [])
        ]
        self.words: Dict[str, int] = {}

    def feed(self, iterator: Iterable[str], process: Callable[[str], List[str]]) -> None:
        for sequence in iterator:
            for word in process(sequence):
                self.words[word] = self.words.get(word, 0) + 1

    def train(self, model) -> List[AddedToken]:
        ordered = sorted(self.words.items(), key=lambda kv: (-kv[1], kv[0]))
        vocab: Dict[str, int] = {}
        for token in self.special_tokens:
            if token.content not in vocab:
                vocab[token.content] = len(vocab)
        for word, count in ordered:
            if count < self.min_frequency:
                continue
            if len(vocab) >= self.vocab_size:
                break
            if word not in vocab:
                vocab[word] = len(vocab)
        model.vocab = vocab
        model.vocab_r = {v: k for k, v in vocab.items()}
        return list(self.special_tokens)
