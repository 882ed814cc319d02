"""Trainers: BPE (distributed flagship), WordPiece, WordLevel, Unigram."""

from .bpe_trainer import BpeTrainer
from .wordpiece_trainer import WordPieceTrainer
from .wordlevel_trainer import WordLevelTrainer
from .unigram_trainer import UnigramTrainer

__all__ = ["BpeTrainer", "WordPieceTrainer", "WordLevelTrainer", "UnigramTrainer"]
