"""tokenizers_tpu: a TPU-native tokenization framework in JAX/XLA/Pallas.

Covers the full HuggingFace `tokenizers` pipeline (see SURVEY.md at the repo
root): normalizers, pre-tokenizers, models (BPE / WordPiece / WordLevel /
Unigram), post-processors, decoders, added vocabulary, truncation/padding,
training, and `tokenizer.json` serialization — with batched TPU kernels for
the hot encode paths and data-parallel training over `jax.sharding` meshes.
"""

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (~/.cache/tokenizers_tpu/jax_cache).

    The encode programs are large and this backend's compiles are slow
    (minutes at serving chunk shapes, scaling ~linearly with the chunk);
    the on-disk cache drops a warm process's compile cost to seconds.
    Opt out with TOKENIZERS_TPU_COMPCACHE=0 or by pre-setting
    jax_compilation_cache_dir yourself."""
    if _os.environ.get("TOKENIZERS_TPU_COMPCACHE", "1") in ("0", "false"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            d = _os.path.join(
                _os.path.expanduser("~"), ".cache", "tokenizers_tpu",
                "jax_cache",
            )
            _os.makedirs(d, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", d)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:
        pass


_enable_compilation_cache()

from .added_vocabulary import AddedToken  # noqa: E402
from .encoding import Encoding
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
