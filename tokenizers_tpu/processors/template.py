"""TemplateProcessing: template DSL for special-token insertion.

Reference `tokenizers/src/processors/template.rs`: templates like
`"[CLS]:0 $A:0 [SEP]:0 $B:1 [SEP]:1"`, `Piece::{Sequence, SpecialToken}`,
special-token id/token maps, `added_tokens(is_pair)`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence as Seq, Tuple, Union

from ..encoding import Encoding
from . import PostProcessor


class Piece:
    """Either a Sequence piece (A/B + type_id) or a SpecialToken piece."""

    __slots__ = ("kind", "id", "type_id")

    def __init__(self, kind: str, id: str, type_id: int):
        self.kind = kind  # "Sequence" | "SpecialToken"
        self.id = id  # "A"/"B" for Sequence, token id-string for SpecialToken
        self.type_id = type_id

    def __eq__(self, other):
        return (
            isinstance(other, Piece)
            and (self.kind, self.id, self.type_id)
            == (other.kind, other.id, other.type_id)
        )

    def __repr__(self):
        return f"Piece({self.kind}, {self.id!r}, {self.type_id})"

    @staticmethod
    def _extract_id(s: str) -> Optional["Piece"]:
        if s.startswith("$"):
            rest = s[1:]
            if rest == "" or rest in ("A", "a"):
                return Piece("Sequence", "A", 0)
            if rest in ("B", "b"):
                return Piece("Sequence", "B", 0)
            try:
                type_id = int(rest)
            except ValueError:
                return None
            if type_id < 0:
                return None
            return Piece("Sequence", "A", type_id)
        return Piece("SpecialToken", s, 0)

    @classmethod
    def parse(cls, s: str) -> "Piece":
        parts = s.split(":")
        if len(parts) == 2:
            piece = cls._extract_id(parts[0])
            if piece is None:
                raise ValueError(f'Cannot build Piece from string "{s}"')
            try:
                piece.type_id = int(parts[1])
            except ValueError:
                raise ValueError(f'Cannot build Piece from string "{s}"')
            return piece
        if len(parts) == 1:
            piece = cls._extract_id(parts[0])
            if piece is None:
                raise ValueError(f'Cannot build Piece from string "{s}"')
            return piece
        raise ValueError(f'Cannot build Piece from string "{s}"')


class SpecialToken:
    __slots__ = ("id", "ids", "tokens")

    def __init__(self, id: str, ids: List[int], tokens: Optional[List[str]] = None):
        if tokens is None:
            tokens = [id]
        if len(ids) != len(tokens):
            raise ValueError("SpecialToken: ids and tokens must be of the same length")
        self.id = id
        self.ids = list(ids)
        self.tokens = list(tokens)

    @classmethod
    def coerce(cls, v) -> "SpecialToken":
        if isinstance(v, SpecialToken):
            return v
        if isinstance(v, tuple) and len(v) == 2:
            a, b = v
            if isinstance(a, str):
                return cls(a, [b], [a])
            return cls(b, [a], [b])
        raise TypeError(f"Cannot build SpecialToken from {v!r}")


class Template:
    __slots__ = ("pieces",)

    def __init__(self, pieces: List[Piece]):
        self.pieces = pieces

    @classmethod
    def parse(cls, spec: Union[str, Seq]) -> "Template":
        if isinstance(spec, str):
            parts = spec.split()
        else:
            parts = list(spec)
        pieces = []
        for p in parts:
            if isinstance(p, Piece):
                pieces.append(p)
            else:
                pieces.append(Piece.parse(p))
        return cls(pieces)


class TemplateProcessing(PostProcessor):
    def __init__(
        self,
        single: Union[str, Seq, Template] = "$0",
        pair: Union[str, Seq, Template] = "$A:0 $B:1",
        special_tokens: Optional[Seq] = None,
    ):
        self.single = single if isinstance(single, Template) else Template.parse(single)
        self.pair = pair if isinstance(pair, Template) else Template.parse(pair)
        tokens: Dict[str, SpecialToken] = {}
        for t in special_tokens or []:
            st = SpecialToken.coerce(t)
            tokens[st.id] = st
        self.special_tokens = tokens
        self._validate()
        self.added_single = self._count_added(self.single)
        self.added_pair = self._count_added(self.pair)

    def _count_added(self, template: Template) -> int:
        total = 0
        for p in template.pieces:
            if p.kind == "SpecialToken":
                st = self.special_tokens.get(p.id)
                if st is not None:
                    total += len(st.ids)
        return total

    def _validate(self):
        has_a = any(
            p.kind == "Sequence" and p.id == "A" for p in self.pair.pieces
        )
        has_b = any(
            p.kind == "Sequence" and p.id == "B" for p in self.pair.pieces
        )
        if not (has_a and has_b):
            raise ValueError("Template for `pair` must use both sequences")
        missing = set()
        for p in self.single.pieces + self.pair.pieces:
            if p.kind == "SpecialToken" and p.id not in self.special_tokens:
                missing.add(p.id)
        if missing:
            raise ValueError(
                f"Missing SpecialToken(s) with id(s) `{', '.join(sorted(missing))}`"
            )

    def added_tokens(self, is_pair: bool) -> int:
        return self.added_pair if is_pair else self.added_single

    def process_encodings(
        self, encodings: List[Encoding], add_special_tokens: bool
    ) -> List[Encoding]:
        if len(encodings) == 2:
            template = self.pair
        elif len(encodings) == 1:
            template = self.single
        else:
            raise ValueError("encodings vector length must be either 1 or 2")
        return self._apply_template(template, encodings, add_special_tokens)

    def _apply_template(
        self, template: Template, encodings: List[Encoding], add_special_tokens: bool
    ) -> List[Encoding]:
        final: List[Encoding] = []
        for piece in template.pieces:
            if piece.kind == "Sequence":
                i = 0 if piece.id == "A" else 1
                encoding = encodings[i]
                encoding.type_ids = [piece.type_id] * len(encoding)
                encoding.set_sequence_id(i)
                final.append(encoding.copy())
            else:
                if not add_special_tokens:
                    continue
                tok = self.special_tokens[piece.id]
                n = len(tok.ids)
                final.append(
                    Encoding(
                        ids=list(tok.ids),
                        type_ids=[piece.type_id] * n,
                        tokens=list(tok.tokens),
                        words=[None] * n,
                        offsets=[(0, 0)] * n,
                        special_tokens_mask=[1] * n,
                        attention_mask=[1] * n,
                    )
                )
        return final
