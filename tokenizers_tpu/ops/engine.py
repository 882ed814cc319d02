"""Device engine dispatch: compile a Tokenizer's pipeline to batched TPU ops.

`build_device_engine(tokenizer)` inspects the pipeline and returns an engine
object with `encode_batch(list[str], add_special_tokens) -> list[Encoding]`
when every stage is device-compilable, else None (host path is used).

Engines (tried in order):
  * ByteLevelBpeEngine — gpt2 / llama-3 byte-level BPE (`bpe_engine.py`)
  * WordPieceEngine    — BERT pipelines (`wordpiece_engine.py`)
  * UnigramEngine      — SentencePiece pipelines (`unigram_engine.py`)
"""

from __future__ import annotations


def build_device_engine(tokenizer):
    try:
        from .bpe_engine import ByteLevelBpeEngine

        engine = ByteLevelBpeEngine.try_build(tokenizer)
        if engine is not None:
            return engine
    except ImportError:
        pass
    try:
        from .wordpiece_engine import WordPieceEngine

        engine = WordPieceEngine.try_build(tokenizer)
        if engine is not None:
            return engine
    except ImportError:
        pass
    try:
        from .unigram_engine import UnigramEngine

        engine = UnigramEngine.try_build(tokenizer)
        if engine is not None:
            return engine
    except ImportError:
        pass
    return None
