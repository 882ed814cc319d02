"""UnigramTrainer: SentencePiece-style EM training.

Reference `tokenizers/src/models/unigram/trainer.rs`: suffix-array seeding,
EM (E-step lattice marginals / M-step digamma), piece pruning by likelihood
loss. Implemented in `tokenizers_tpu.trainers.unigram_em` (host seeding +
vectorized EM); this class holds the configuration and driver.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Set

from ..added_vocabulary import AddedToken


class UnigramTrainer:
    def __init__(
        self,
        vocab_size: int = 8000,
        show_progress: bool = True,
        special_tokens: Optional[List] = None,
        initial_alphabet: Optional[Set[str]] = None,
        shrinking_factor: float = 0.75,
        unk_token: Optional[str] = None,
        max_piece_length: int = 16,
        n_sub_iterations: int = 2,
        seed_size: int = 1_000_000,
        mesh=None,
    ):
        # `mesh`: optional jax.sharding.Mesh — the EM E-step and pruning
        # Viterbi statistics are sharded over its first axis with psum'd
        # expectations (SURVEY §2.9; reference rayon chunks,
        # `models/unigram/trainer.rs:451-491`).  Without a mesh the device
        # programs still run batched on the default device.
        self.vocab_size = vocab_size
        self.show_progress = show_progress
        self.special_tokens = [
            t if isinstance(t, AddedToken) else AddedToken(t, special=True)
            for t in (special_tokens or [])
        ]
        self.initial_alphabet = set(initial_alphabet or [])
        self.shrinking_factor = shrinking_factor
        self.unk_token = unk_token
        self.max_piece_length = max_piece_length
        self.n_sub_iterations = n_sub_iterations
        self.seed_size = seed_size
        self.mesh = mesh
        self.words: Dict[str, int] = {}

    def feed(self, iterator: Iterable[str], process: Callable[[str], List[str]]) -> None:
        for sequence in iterator:
            for word in process(sequence):
                self.words[word] = self.words.get(word, 0) + 1

    def train(self, model) -> List[AddedToken]:
        from .unigram_em import do_train

        return do_train(self, self.words, model)
