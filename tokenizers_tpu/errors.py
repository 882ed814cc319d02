"""Typed exception hierarchy mirroring the reference's `thiserror` enums.

The reference wraps every fallible path in module-level error enums —
`TruncationError` (`utils/truncation.rs:42-50`), the BPE model `Error`
(`models/bpe/mod.rs`), serde errors surfaced through
`tokenizer/serialization.rs` — all boxed into `tokenizers::Error` and
mapped to Python exceptions by the binding (`bindings/python/src/error.rs`,
which raises them as subclasses of builtin exceptions).  Here each class
subclasses both the shared root `TokenizersError` and the builtin the
corresponding site historically raised, so `except ValueError` code keeps
working while `except TokenizersError` catches everything typed.
"""

from __future__ import annotations


class TokenizersError(Exception):
    """Root of all typed tokenizers_tpu errors."""


class TruncationError(TokenizersError, ValueError):
    """Invalid truncation parameters or inputs
    (reference `utils/truncation.rs:42-50`)."""


class SerdeError(TokenizersError, ValueError):
    """tokenizer.json (de)serialization failure — unknown component type,
    non-serializable custom component, malformed payload
    (reference `tokenizer/serialization.rs`)."""


class ModelError(TokenizersError, ValueError):
    """Invalid model data — merge token out of vocabulary, malformed
    merges line, missing unk token (reference `models/bpe/mod.rs` Error)."""


class TrainingError(TokenizersError, ValueError):
    """Trainer failure (reference unigram `trainer.rs` errors)."""


class InputError(TokenizersError, TypeError):
    """Invalid encode input type (reference `EncodeInput` conversions in
    `bindings/python/src/tokenizer.rs:282-345`)."""
