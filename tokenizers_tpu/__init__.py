"""tokenizers_tpu: a TPU-native tokenization framework in JAX/XLA/Pallas.

Covers the full HuggingFace `tokenizers` pipeline (see SURVEY.md at the repo
root): normalizers, pre-tokenizers, models (BPE / WordPiece / WordLevel /
Unigram), post-processors, decoders, added vocabulary, truncation/padding,
training, and `tokenizer.json` serialization — with batched TPU kernels for
the hot encode paths and data-parallel training over `jax.sharding` meshes.
"""

# Persistent XLA compile cache policy lives in ops/__init__.py (single
# source of truth; guarded off on the CPU backend — see the note there).
from .ops import _enable_compilation_cache as _  # noqa: F401

from .added_vocabulary import AddedToken  # noqa: E402
from .encoding import Encoding
from .errors import (  # noqa: E402
    InputError,
    ModelError,
    SerdeError,
    TokenizersError,
    TrainingError,
    TruncationError,
)
from .normalized import NormalizedString
from .pretokenized import PreTokenizedString, Token
from .tokenizer import DecodeStream, Tokenizer

from . import decoders  # noqa: E402
from . import models  # noqa: E402
from . import normalizers  # noqa: E402
from . import pre_tokenizers  # noqa: E402
from . import processors  # noqa: E402
from . import trainers  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "AddedToken",
    "Encoding",
    "TokenizersError",
    "TruncationError",
    "SerdeError",
    "ModelError",
    "TrainingError",
    "InputError",
    "NormalizedString",
    "PreTokenizedString",
    "Token",
    "Tokenizer",
    "DecodeStream",
    "decoders",
    "models",
    "normalizers",
    "pre_tokenizers",
    "processors",
    "trainers",
]
