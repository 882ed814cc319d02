"""Device engine dispatch: compile a Tokenizer's pipeline to batched TPU ops.

`build_device_engine(tokenizer)` inspects the pipeline and returns an engine
object with `encode_batch(list[str], add_special_tokens) -> list[Encoding]`
when every stage is device-compilable, else None (host path is used).

Engines (tried in order):
  * ByteLevelBpeEngine — gpt2 / llama-3 byte-level BPE (`bpe_engine.py`)
  * WordPieceEngine    — BERT pipelines (`wordpiece_engine.py`)
  * UnigramEngine      — SentencePiece pipelines (`unigram_engine.py`)

Set ``TOKENIZERS_LOG=debug`` to see which engine matched (or why none did)
— the TPU analogue of the reference's TOKENIZERS_LOG env_logger switch
(`bindings/python/src/lib.rs:63`).
"""

from __future__ import annotations

from ..utils.log import get_logger

log = get_logger("engine")


def build_device_engine(tokenizer):
    candidates = []
    try:
        from .bpe_engine import ByteLevelBpeEngine

        candidates.append(ByteLevelBpeEngine)
    except ImportError:
        pass
    try:
        from .wordpiece_engine import WordPieceEngine

        candidates.append(WordPieceEngine)
    except ImportError:
        pass
    try:
        from .unigram_engine import UnigramEngine

        candidates.append(UnigramEngine)
    except ImportError:
        pass
    try:
        from .wordlevel_engine import WordLevelEngine

        candidates.append(WordLevelEngine)
    except ImportError:
        pass
    try:
        from .charbpe_engine import CharBpeEngine

        candidates.append(CharBpeEngine)
    except ImportError:
        pass

    for cls in candidates:
        engine = cls.try_build(tokenizer)
        if engine is not None:
            log.debug("pipeline compiled to %s", cls.__name__)
            return engine
    log.debug(
        "no device engine matched (model=%s, normalizer=%s, pre_tokenizer=%s)"
        " — using the host path",
        type(tokenizer.model).__name__,
        type(tokenizer.normalizer).__name__ if tokenizer.normalizer else None,
        type(tokenizer.pre_tokenizer).__name__
        if tokenizer.pre_tokenizer
        else None,
    )
    return None
