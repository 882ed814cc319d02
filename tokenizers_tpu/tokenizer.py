"""Tokenizer: the pipeline holder and orchestration layer.

Host-exact equivalent of reference `tokenizers/src/tokenizer/mod.rs`
(`TokenizerImpl`): normalizer -> pre-tokenizer -> model -> post-processor ->
decoder, plus added-vocabulary extraction, truncation/padding, batch APIs,
training driver and `tokenizer.json` (de)serialization.

`encode_batch` transparently dispatches to the compiled TPU engine
(`tokenizers_tpu.ops.engine`) when the pipeline is device-compilable and
offsets are not requested; the host path is the semantic reference and serves
the long tail.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

from .added_vocabulary import AddedToken, AddedVocabulary
from .encoding import Encoding
from .models import Model
from .pretokenized import BYTE, CHAR, NONE, PreTokenizedString
from .utils.padding import BATCH_LONGEST, PaddingParams, pad_encodings
from .utils.truncation import TruncationParams, truncate_encodings

InputSequence = Union[str, Sequence[str]]


def _as_sequence(x):
    """Normalize numpy unicode/object arrays and numpy scalar strings to
    plain Python types (reference accepts numpy arrays as input sequences,
    `bindings/python/src/tokenizer.rs:282-345`)."""
    try:
        import numpy as _np
    except ImportError:  # pragma: no cover
        return x
    if isinstance(x, _np.str_):
        return str(x)
    if isinstance(x, _np.ndarray):
        if x.dtype.kind in ("U", "S", "O"):
            return [_as_sequence(v) for v in x.tolist()]
        raise TypeError(
            "numpy array inputs must have unicode (U), bytes (S) or "
            f"object (O) dtype, got {x.dtype}"
        )
    return x


def _parse_text_input(sequence):
    """Non-pretokenized single sequence: must be str."""
    sequence = _as_sequence(sequence)
    if isinstance(sequence, bytes):
        sequence = sequence.decode("utf-8")
    if not isinstance(sequence, str):
        raise TypeError("TextInputSequence must be str")
    return sequence


def _parse_pretokenized_input(sequence):
    """Pre-tokenized single sequence: a sequence of str (not a str)."""
    sequence = _as_sequence(sequence)
    if isinstance(sequence, str) or not isinstance(sequence, (list, tuple)):
        raise TypeError(
            "PreTokenizedInputSequence must be Union[List[str], Tuple[str]]"
        )
    out = []
    for item in sequence:
        item = _as_sequence(item)
        if isinstance(item, bytes):
            item = item.decode("utf-8")
        if not isinstance(item, str):
            raise TypeError(
                "PreTokenizedInputSequence must be Union[List[str], Tuple[str]]"
            )
        out.append(item)
    return out


def _parse_encode_input(input, is_pretokenized):
    """Batch item -> (sequence, pair_or_None), honoring `is_pretokenized`
    exactly as the reference binding's EncodeInput conversion does
    (`bindings/python/src/tokenizer.rs:195-276`): a 2-element tuple/list of
    sequences is a dual-sequence input; otherwise the item is one sequence."""
    input = _as_sequence(input)
    if is_pretokenized:
        if (
            isinstance(input, (tuple, list))
            and len(input) == 2
            and all(
                isinstance(_as_sequence(x), (list, tuple))
                and not isinstance(_as_sequence(x), str)
                for x in input
            )
        ):
            return (
                _parse_pretokenized_input(input[0]),
                _parse_pretokenized_input(input[1]),
            )
        return _parse_pretokenized_input(input), None
    if isinstance(input, (tuple, list)):
        if len(input) == 2:
            return _parse_text_input(input[0]), _parse_text_input(input[1])
        raise TypeError(
            "TextEncodeInput must be Union[TextInputSequence, "
            "Tuple[InputSequence, InputSequence]]"
        )
    return _parse_text_input(input), None


class Tokenizer:
    def __init__(self, model: Model):
        self.model = model
        self.normalizer = None
        self.pre_tokenizer = None
        self.post_processor = None
        self.decoder = None
        self.added_vocabulary = AddedVocabulary()
        self.truncation: Optional[TruncationParams] = None
        self.padding: Optional[PaddingParams] = None
        self._device_engine = None
        self._device_engine_key = None

    # ------------------------------------------------------------------ io

    @classmethod
    def from_str(cls, s: str) -> "Tokenizer":
        from .serialization import tokenizer_from_dict
        from .utils.serde_float import serde_f64

        # Floats must be parsed exactly as the reference's serde_json does
        # (NOT correctly rounded): Unigram ties depend on the last ulp.
        return tokenizer_from_dict(json.loads(s, parse_float=serde_f64))

    @classmethod
    def from_file(cls, path: str) -> "Tokenizer":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_str(f.read())

    @classmethod
    def from_buffer(cls, buffer: bytes) -> "Tokenizer":
        return cls.from_str(buffer.decode("utf-8"))

    @classmethod
    def from_pretrained(
        cls, identifier: str, revision: str = "main", token: Optional[str] = None
    ) -> "Tokenizer":
        """Load a `tokenizer.json` from a local path, the HF hub cache, or
        by downloading it from the hub (reference
        `utils/from_pretrained.rs:26-68`).  Resolution order: literal
        path, directory containing tokenizer.json, hub cache snapshot,
        then a network fetch (cached for subsequent loads; controlled by
        `HF_HUB_OFFLINE=1`)."""
        candidates = [
            identifier,
            os.path.join(identifier, "tokenizer.json"),
        ]
        hub_cache = os.environ.get(
            "HF_HUB_CACHE",
            os.path.join(
                os.environ.get(
                    "HF_HOME", os.path.expanduser("~/.cache/huggingface")
                ),
                "hub",
            ),
        )
        model_dir = os.path.join(
            hub_cache, "models--" + identifier.replace("/", "--")
        )
        if os.path.isdir(model_dir):
            snapshots = os.path.join(model_dir, "snapshots")
            if os.path.isdir(snapshots):
                for snap in sorted(os.listdir(snapshots)):
                    candidates.append(os.path.join(snapshots, snap, "tokenizer.json"))
        for cand in candidates:
            if os.path.isfile(cand):
                return cls.from_file(cand)

        if os.environ.get("HF_HUB_OFFLINE") not in (None, "", "0"):
            raise FileNotFoundError(
                f"Could not find a local tokenizer.json for {identifier!r} "
                "and HF_HUB_OFFLINE is set"
            )
        # hub download (the reference delegates to hf-hub's blocking API;
        # here a direct resolve fetch, stored in the same cache layout)
        import urllib.error
        import urllib.request

        url = (
            "https://huggingface.co/"
            f"{identifier}/resolve/{revision}/tokenizer.json"
        )
        req = urllib.request.Request(
            url,
            headers={
                "User-Agent": "tokenizers-tpu/0.1.0",
                **({"Authorization": f"Bearer {token}"} if token else {}),
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                data = r.read()
        except (urllib.error.URLError, OSError) as e:
            raise FileNotFoundError(
                f"Could not find a local tokenizer.json for {identifier!r} "
                f"and the hub download failed: {e}"
            ) from e
        snap_dir = os.path.join(model_dir, "snapshots", revision)
        os.makedirs(snap_dir, exist_ok=True)
        path = os.path.join(snap_dir, "tokenizer.json")
        with open(path, "wb") as f:
            f.write(data)
        return cls.from_file(path)

    # Pickling via the serialized JSON, like the reference binding
    # (`bindings/python/src/tokenizer.rs:598-621`).  Device engines and
    # their on-device tables are rebuilt lazily after unpickling.
    def __getstate__(self):
        return {"tokenizer_json": self.to_str()}

    def __setstate__(self, state):
        fresh = Tokenizer.from_str(state["tokenizer_json"])
        self.__dict__.update(fresh.__dict__)

    def __reduce__(self):
        return (Tokenizer.from_str, (self.to_str(),))

    def to_str(self, pretty: bool = False) -> str:
        from .serialization import tokenizer_to_dict

        d = tokenizer_to_dict(self)
        if pretty:
            return json.dumps(d, ensure_ascii=False, indent=2)
        return json.dumps(d, ensure_ascii=False, separators=(",", ":"))

    def save(self, path: str, pretty: bool = True) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_str(pretty))

    # -------------------------------------------------------------- settings

    def enable_truncation(
        self,
        max_length: int,
        stride: int = 0,
        strategy: str = "longest_first",
        direction: str = "right",
    ) -> None:
        self.truncation = TruncationParams(max_length, strategy, stride, direction)

    def no_truncation(self) -> None:
        self.truncation = None

    def get_truncation(self) -> Optional[TruncationParams]:
        return self.truncation

    def enable_padding(
        self,
        direction: str = "right",
        pad_id: int = 0,
        pad_type_id: int = 0,
        pad_token: str = "[PAD]",
        length: Optional[int] = None,
        pad_to_multiple_of: Optional[int] = None,
    ) -> None:
        strategy = BATCH_LONGEST if length is None else length
        self.padding = PaddingParams(
            strategy, direction, pad_to_multiple_of, pad_id, pad_type_id, pad_token
        )

    def no_padding(self) -> None:
        self.padding = None

    def get_padding(self) -> Optional[PaddingParams]:
        return self.padding

    def set_encode_special_tokens(self, value: bool) -> None:
        self.added_vocabulary.encode_special_tokens = value

    def get_encode_special_tokens(self) -> bool:
        return self.added_vocabulary.encode_special_tokens

    # ----------------------------------------------------------------- vocab

    def get_vocab(self, with_added_tokens: bool = True) -> Dict[str, int]:
        vocab = self.model.get_vocab()
        if with_added_tokens:
            vocab.update(self.added_vocabulary.get_vocab())
        return vocab

    def get_vocab_size(self, with_added_tokens: bool = True) -> int:
        if not with_added_tokens:
            return self.model.get_vocab_size()
        n = self.model.get_vocab_size()
        for content, id in self.added_vocabulary.get_vocab().items():
            if self.model.token_to_id(content) is None:
                n += 1
        return n

    def get_added_tokens_decoder(self) -> Dict[int, AddedToken]:
        return self.added_vocabulary.get_added_tokens_decoder()

    def token_to_id(self, token: str) -> Optional[int]:
        return self.added_vocabulary.token_to_id(token, self.model)

    def id_to_token(self, id: int) -> Optional[str]:
        tok = self.added_vocabulary.added_tokens_map_r.get(id)
        if tok is not None:
            return tok.content
        return self.model.id_to_token(id)

    def add_tokens(self, tokens: Sequence[Union[str, AddedToken]]) -> int:
        toks = [
            t if isinstance(t, AddedToken) else AddedToken(t, normalized=True)
            for t in tokens
        ]
        self._device_engine = None
        return self.added_vocabulary.add_tokens(toks, self.model, self.normalizer)

    def add_special_tokens(self, tokens: Sequence[Union[str, AddedToken]]) -> int:
        toks = [
            t if isinstance(t, AddedToken) else AddedToken(t, special=True)
            for t in tokens
        ]
        self._device_engine = None
        return self.added_vocabulary.add_special_tokens(
            toks, self.model, self.normalizer
        )

    def num_special_tokens_to_add(self, is_pair: bool) -> int:
        return (
            self.post_processor.added_tokens(is_pair) if self.post_processor else 0
        )

    # ---------------------------------------------------------------- encode

    def _encode_single_sequence(
        self, sequence: InputSequence, type_id: int, offsets_type: str
    ) -> Encoding:
        def encode_one(is_pretokenized: bool, idx: int, subseq: str) -> Encoding:
            pretokenized = self.added_vocabulary.extract_and_normalize(
                self.normalizer, subseq
            )
            if self.pre_tokenizer is not None:
                self.pre_tokenizer.pre_tokenize(pretokenized)
            pretokenized.tokenize(
                lambda normalized: self.model.tokenize(normalized.get())
            )
            return pretokenized.into_encoding(
                idx if is_pretokenized else None, type_id, offsets_type
            )

        if isinstance(sequence, str):
            return encode_one(False, 0, sequence)
        encodings = [encode_one(True, i, s) for i, s in enumerate(sequence)]
        merged = Encoding()
        for e in encodings:
            merged.merge_with(e, False)
        return merged

    def encode(
        self,
        sequence: InputSequence,
        pair: Optional[InputSequence] = None,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> Encoding:
        """Char-referential offsets, matching the reference Python binding
        (`bindings/python/src/tokenizer.rs:1070` wraps `encode_char_offsets`).
        Use `encode_byte_offsets` for the Rust-core byte referential."""
        return self._encode(
            sequence, pair, add_special_tokens, CHAR, is_pretokenized
        )

    def encode_byte_offsets(
        self,
        sequence: InputSequence,
        pair: Optional[InputSequence] = None,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> Encoding:
        """Byte-referential offsets (reference Rust `tokenizer/mod.rs:827`)."""
        return self._encode(
            sequence, pair, add_special_tokens, BYTE, is_pretokenized
        )

    def encode_char_offsets(
        self,
        sequence: InputSequence,
        pair: Optional[InputSequence] = None,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> Encoding:
        return self._encode(
            sequence, pair, add_special_tokens, CHAR, is_pretokenized
        )

    def encode_fast(
        self,
        sequence: InputSequence,
        pair: Optional[InputSequence] = None,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> Encoding:
        """No offsets/tokens tracking (reference `tokenizer/mod.rs:785`)."""
        return self._encode(
            sequence, pair, add_special_tokens, NONE, is_pretokenized
        )

    def _encode(
        self,
        sequence,
        pair,
        add_special_tokens,
        offsets_type,
        is_pretokenized=False,
    ) -> Encoding:
        parse = (
            _parse_pretokenized_input if is_pretokenized else _parse_text_input
        )
        encoding = self._encode_single_sequence(
            parse(sequence), 0, offsets_type
        )
        pair_encoding = (
            self._encode_single_sequence(parse(pair), 1, offsets_type)
            if pair is not None
            else None
        )
        return self.post_process(encoding, pair_encoding, add_special_tokens)

    def encode_batch(
        self,
        inputs: Sequence,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> List[Encoding]:
        """Batch encode with char offsets, matching the reference Python
        binding (`bindings/python/src/tokenizer.rs:1207`); dispatches to the
        TPU engine when compilable."""
        return self._encode_batch(
            inputs, add_special_tokens, CHAR, is_pretokenized
        )

    def encode_batch_byte_offsets(
        self,
        inputs: Sequence,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> List[Encoding]:
        """(reference Rust `tokenizer/mod.rs:1278`)"""
        return self._encode_batch(
            inputs, add_special_tokens, BYTE, is_pretokenized
        )

    def encode_batch_char_offsets(
        self,
        inputs: Sequence,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> List[Encoding]:
        return self._encode_batch(
            inputs, add_special_tokens, CHAR, is_pretokenized
        )

    def encode_batch_fast(
        self,
        inputs: Sequence,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> List[Encoding]:
        return self._encode_batch(
            inputs, add_special_tokens, NONE, is_pretokenized
        )

    def _encode_batch(
        self, inputs, add_special_tokens, offsets_type, is_pretokenized=False
    ) -> List[Encoding]:
        inputs = _as_sequence(inputs)
        engine = self._get_device_engine()
        if engine is not None and offsets_type != NONE and not engine.supports_offsets:
            engine = None
        if (
            engine is not None
            and not is_pretokenized
            and all(isinstance(i, str) for i in inputs)
        ):
            if offsets_type == NONE:
                encodings = engine.encode_batch(list(inputs), add_special_tokens)
            else:
                encodings = engine.encode_batch_offsets(
                    list(inputs), add_special_tokens, offsets_type == CHAR
                )
        else:
            # host fallback: fan out over forked workers, mirroring the
            # reference's rayon batch parallelism gated by
            # TOKENIZERS_PARALLELISM (`utils/parallelism.rs:15-62`,
            # `tokenizer/mod.rs:1278-1342`)
            from .utils.parallelism import maybe_par_map

            def encode_one(input):
                seq, pr = _parse_encode_input(input, is_pretokenized)
                return self._encode(
                    seq, pr, add_special_tokens, offsets_type, is_pretokenized
                )

            encodings = maybe_par_map(encode_one, list(inputs))
        if self.padding is not None:
            pad_encodings(encodings, self.padding)
        return encodings

    def _get_device_engine(self):
        """Build (and cache) the compiled TPU engine if this pipeline is
        device-compilable."""
        from .ops.engine import build_device_engine

        key = id(self.model)
        if self._device_engine is None or self._device_engine_key != key:
            self._device_engine = build_device_engine(self)
            self._device_engine_key = key
        return self._device_engine

    # ------------------------------------------------------------- post/pad

    def post_process(
        self,
        encoding: Encoding,
        pair_encoding: Optional[Encoding] = None,
        add_special_tokens: bool = True,
    ) -> Encoding:
        """truncate -> process -> pad (reference `tokenizer/mod.rs:1206`)."""
        if self.truncation is not None:
            n_added = self.num_special_tokens_to_add(pair_encoding is not None)
            if add_special_tokens and n_added > 0:
                params = TruncationParams(
                    max(0, self.truncation.max_length - n_added),
                    self.truncation.strategy,
                    self.truncation.stride,
                    self.truncation.direction,
                )
            else:
                params = self.truncation
            encoding, pair_encoding = truncate_encodings(
                encoding, pair_encoding, params
            )

        if self.post_processor is not None:
            final = self.post_processor.process(
                encoding, pair_encoding, add_special_tokens
            )
        else:
            from .processors import default_process

            encodings = [encoding]
            if pair_encoding is not None:
                encodings.append(pair_encoding)
            out = default_process(encodings, add_special_tokens)
            assert len(out) == 1
            final = out[0]

        if self.padding is not None:
            pad_encodings([final], self.padding)
        return final

    # ---------------------------------------------------------------- decode

    # ------------------------------------------------------------- async
    # Reference Python binding exposes tokio-spawn_blocking async variants
    # (`bindings/python/src/tokenizer.rs:1135-1432`); here the blocking work
    # runs in asyncio's default thread pool.

    async def async_encode(
        self,
        sequence: InputSequence,
        pair: Optional[InputSequence] = None,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> Encoding:
        import asyncio

        return await asyncio.to_thread(
            self.encode, sequence, pair, is_pretokenized, add_special_tokens
        )

    async def async_encode_batch(
        self,
        inputs: Sequence,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> List[Encoding]:
        import asyncio

        return await asyncio.to_thread(
            self.encode_batch, inputs, is_pretokenized, add_special_tokens
        )

    async def async_encode_batch_fast(
        self,
        inputs: Sequence,
        is_pretokenized: bool = False,
        add_special_tokens: bool = True,
    ) -> List[Encoding]:
        import asyncio

        return await asyncio.to_thread(
            self.encode_batch_fast, inputs, is_pretokenized, add_special_tokens
        )

    async def async_decode(
        self, ids: Sequence[int], skip_special_tokens: bool = True
    ) -> str:
        import asyncio

        return await asyncio.to_thread(self.decode, ids, skip_special_tokens)

    async def async_decode_batch(
        self, sequences, skip_special_tokens: bool = True
    ) -> List[str]:
        import asyncio

        return await asyncio.to_thread(
            self.decode_batch, sequences, skip_special_tokens
        )

    def normalize(self, sequence: str) -> str:
        """Run just the normalizer (reference Python binding `normalize`)."""
        from .normalized import NormalizedString

        ns = NormalizedString(sequence)
        if self.normalizer is not None:
            self.normalizer.normalize(ns)
        return ns.get()

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        tokens = []
        for id in ids:
            token = self.id_to_token(int(id))
            if token is None:
                continue
            if skip_special_tokens and self.added_vocabulary.is_special_token(token):
                continue
            tokens.append(token)
        if self.decoder is not None:
            return self.decoder.decode(tokens)
        return " ".join(tokens)

    def decode_batch(
        self, sequences: Sequence[Sequence[int]], skip_special_tokens: bool = True
    ) -> List[str]:
        """(reference `tokenizer/mod.rs:1345` — maybe-parallel over items)"""
        from .utils.parallelism import maybe_par_map

        return maybe_par_map(
            lambda ids: self.decode(ids, skip_special_tokens),
            list(sequences),
            min_items=64,
        )

    def decode_stream(self, skip_special_tokens: bool = True) -> "DecodeStream":
        return DecodeStream(self, skip_special_tokens)

    # ----------------------------------------------------------------- train

    def train(self, files: Sequence[str], trainer=None) -> "Tokenizer":
        from .utils.iter import file_lines_with_ending

        return self.train_from_iterator(file_lines_with_ending(files), trainer)

    def train_from_iterator(
        self, iterator: Iterable[str], trainer=None, length: Optional[int] = None
    ) -> "Tokenizer":
        if trainer is None:
            trainer = self.model.get_trainer()

        def process_fn(seq: str) -> List[str]:
            pretokenized = self.added_vocabulary.extract_and_normalize(
                self.normalizer, seq
            )
            if self.pre_tokenizer is not None:
                self.pre_tokenizer.pre_tokenize(pretokenized)
            return [
                s for s, _, _ in pretokenized.get_splits("original", BYTE)
            ]

        trainer.feed(iterator, process_fn)
        special_tokens = trainer.train(self.model)
        self.add_special_tokens(special_tokens)
        self._device_engine = None
        return self


class DecodeStream:
    """Incremental decoding with prefix-trim state machine
    (reference `tokenizer/mod.rs:1017-1127`)."""

    __slots__ = ("tokenizer", "skip_special_tokens", "ids", "prefix", "prefix_index")

    def __init__(self, tokenizer: Tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.ids: List[int] = []
        self.prefix: str = ""
        self.prefix_index: int = 0

    def step(self, id: int) -> Optional[str]:
        return self._step_many([id])

    def _step_many(self, token_ids: List[int]) -> Optional[str]:
        if not self.prefix and self.ids:
            new_prefix = self.tokenizer.decode(self.ids, self.skip_special_tokens)
            if not new_prefix.endswith("�"):
                self.prefix = new_prefix
                self.prefix_index = len(self.ids)

        self.ids.extend(token_ids)
        string = self.tokenizer.decode(self.ids, self.skip_special_tokens)
        if len(string.encode("utf-8")) > len(self.prefix.encode("utf-8")) and not string.endswith("�"):
            if not string.startswith(self.prefix):
                raise ValueError(
                    f"Invalid prefix encountered while decoding stream. "
                    f"Token ID: {self.ids[-1]}, Expected prefix: {self.prefix!r}, "
                    f"Actual string: {string!r}"
                )
            new_text = string[len(self.prefix):]
            new_prefix_index = len(self.ids) - self.prefix_index
            self.ids = self.ids[self.prefix_index:]
            self.prefix = self.tokenizer.decode(self.ids, self.skip_special_tokens)
            self.prefix_index = new_prefix_index
            return new_text
        return None
