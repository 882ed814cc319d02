"""PostProcessors: special-token insertion, type ids, offset trimming.

Reference `tokenizers/src/processors/`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

from ..encoding import Encoding


class PostProcessor:
    def added_tokens(self, is_pair: bool) -> int:
        raise NotImplementedError

    def process_encodings(
        self, encodings: List[Encoding], add_special_tokens: bool
    ) -> List[Encoding]:
        raise NotImplementedError

    def process(
        self,
        encoding: Encoding,
        pair_encoding: Optional[Encoding] = None,
        add_special_tokens: bool = True,
    ) -> Encoding:
        """Default pair-merging process (reference `tokenizer/mod.rs:96-118`)."""
        encodings = [encoding]
        if pair_encoding is not None:
            encodings.append(pair_encoding)
        for i, enc in enumerate(encodings):
            enc.set_sequence_id(i)
            for overflow in enc.overflowing:
                overflow.set_sequence_id(i)
            enc.type_ids = [i] * len(enc)
        encodings = self.process_encodings(encodings, add_special_tokens)
        return Encoding.merge(encodings, False)


def default_process(encodings: List[Encoding], add_special_tokens: bool) -> List[Encoding]:
    """(reference `tokenizer/mod.rs:127-146`)"""
    if len(encodings) == 1:
        return encodings
    final = Encoding()
    for i, enc in enumerate(encodings):
        enc.set_sequence_id(i)
        final.merge_with(enc, False)
    return [final]


class Sequence(PostProcessor):
    def __init__(self, processors: List[PostProcessor]):
        self.processors = list(processors)

    def added_tokens(self, is_pair: bool) -> int:
        return sum(p.added_tokens(is_pair) for p in self.processors)

    def process_encodings(self, encodings, add_special_tokens):
        for p in self.processors:
            encodings = p.process_encodings(encodings, add_special_tokens)
        return encodings

    def __getitem__(self, i):
        return self.processors[i]

    def __len__(self):
        return len(self.processors)


def _wrap_single(encoding: Encoding, cls, sep, type_id_pair: bool) -> Encoding:
    n = len(encoding.ids)
    out = Encoding(
        ids=[cls[1]] + encoding.ids + [sep[1]],
        type_ids=[0] + encoding.type_ids + [0],
        tokens=[cls[0]] + encoding.tokens + [sep[0]],
        words=[None] + encoding.words + [None],
        offsets=[(0, 0)] + encoding.offsets + [(0, 0)],
        special_tokens_mask=[1] + [0] * n + [1],
        attention_mask=[1] * (n + 2),
    )
    out.sequence_ranges = {0: range(1, n + 1)}
    return out


class BertProcessing(PostProcessor):
    """`[CLS] A [SEP] (B [SEP])` with type ids 0/1
    (reference `processors/bert.rs`)."""

    def __init__(self, sep: Tuple[str, int] = ("[SEP]", 102), cls: Tuple[str, int] = ("[CLS]", 101)):
        self.sep = tuple(sep)
        self.cls = tuple(cls)

    def added_tokens(self, is_pair: bool) -> int:
        return 3 if is_pair else 2

    def process_encodings(self, encodings, add_special_tokens):
        if not add_special_tokens:
            return encodings
        out = []
        for i, encoding in enumerate(encodings):
            if i == 0:
                new = _wrap_single(encoding, self.cls, self.sep, False)
                new.overflowing = [
                    _wrap_single(o, self.cls, self.sep, False)
                    for o in encoding.overflowing
                ]
            else:
                n = len(encoding.ids)

                def wrap_pair(enc: Encoding) -> Encoding:
                    m = len(enc.ids)
                    e = Encoding(
                        ids=enc.ids + [self.sep[1]],
                        type_ids=enc.type_ids + [1],
                        tokens=enc.tokens + [self.sep[0]],
                        words=enc.words + [None],
                        offsets=enc.offsets + [(0, 0)],
                        special_tokens_mask=[0] * m + [1],
                        attention_mask=[1] * (m + 1),
                    )
                    e.sequence_ranges = {1: range(0, m)}
                    return e

                new = wrap_pair(encoding)
                new.overflowing = [wrap_pair(o) for o in encoding.overflowing]
            out.append(new)
        return out


class RobertaProcessing(PostProcessor):
    """`<s> A </s> (</s> B </s>)`, type ids all 0, optional offset trimming
    (reference `processors/roberta.rs`)."""

    def __init__(
        self,
        sep: Tuple[str, int] = ("</s>", 2),
        cls: Tuple[str, int] = ("<s>", 0),
        trim_offsets: bool = True,
        add_prefix_space: bool = True,
    ):
        self.sep = tuple(sep)
        self.cls = tuple(cls)
        self.trim_offsets = trim_offsets
        self.add_prefix_space = add_prefix_space

    def added_tokens(self, is_pair: bool) -> int:
        return 4 if is_pair else 2

    def process_encodings(self, encodings, add_special_tokens):
        from ..pre_tokenizers.byte_level import process_offsets

        if self.trim_offsets:
            for encoding in encodings:
                process_offsets(encoding, self.add_prefix_space)
                for o in encoding.overflowing:
                    process_offsets(o, self.add_prefix_space)
        for encoding in encodings:
            encoding.type_ids = [0] * len(encoding)
        if not add_special_tokens:
            return encodings
        out = []
        for i, encoding in enumerate(encodings):
            if i == 0:
                new = _wrap_single(encoding, self.cls, self.sep, False)
                new.overflowing = [
                    _wrap_single(o, self.cls, self.sep, False)
                    for o in encoding.overflowing
                ]
            else:

                def wrap_pair(enc: Encoding) -> Encoding:
                    m = len(enc.ids)
                    e = Encoding(
                        ids=[self.sep[1]] + enc.ids + [self.sep[1]],
                        type_ids=[0] * (m + 2),
                        tokens=[self.sep[0]] + enc.tokens + [self.sep[0]],
                        words=[None] + enc.words + [None],
                        offsets=[(0, 0)] + enc.offsets + [(0, 0)],
                        special_tokens_mask=[1] + [0] * m + [1],
                        attention_mask=[1] * (m + 2),
                    )
                    e.sequence_ranges = {1: range(1, m + 1)}
                    return e

                new = wrap_pair(encoding)
                new.overflowing = [wrap_pair(o) for o in encoding.overflowing]
            out.append(new)
        return out


from .template import TemplateProcessing, SpecialToken, Piece, Template  # noqa: E402
from ..pre_tokenizers.byte_level import ByteLevel  # noqa: E402  (processor role)

# ByteLevel plays the PostProcessor role with the default pair-merging process.
ByteLevel.process = PostProcessor.process

__all__ = [
    "PostProcessor",
    "Sequence",
    "BertProcessing",
    "RobertaProcessing",
    "TemplateProcessing",
    "SpecialToken",
    "Piece",
    "Template",
    "ByteLevel",
    "default_process",
]
