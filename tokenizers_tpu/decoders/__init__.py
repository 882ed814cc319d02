"""Decoders: token strings -> readable text.

Reference `tokenizers/src/decoders/`.
"""

from __future__ import annotations

from typing import List, Optional

from ..pattern import SysRegex


class Decoder:
    def decode(self, tokens: List[str]) -> str:
        return "".join(self.decode_chain(tokens))

    def decode_chain(self, tokens: List[str]) -> List[str]:
        raise NotImplementedError

    @staticmethod
    def custom(obj) -> "CustomDecoder":
        """Wrap a user object with a `decode(List[str]) -> str` method
        (reference `bindings/python/src/decoders.rs`).  Host-only and
        non-serializable."""
        return CustomDecoder(obj)


class CustomDecoder(Decoder):
    def __init__(self, obj):
        if not callable(getattr(obj, "decode", None)):
            raise TypeError(
                "custom decoder must have a decode(List[str]) -> str method"
            )
        self.obj = obj

    def decode(self, tokens: List[str]) -> str:
        return self.obj.decode(tokens)

    def decode_chain(self, tokens: List[str]) -> List[str]:
        if callable(getattr(self.obj, "decode_chain", None)):
            return self.obj.decode_chain(tokens)
        return [self.obj.decode(tokens)]


class Sequence(Decoder):
    def __init__(self, decoders: List[Decoder]):
        self.decoders = list(decoders)

    def decode_chain(self, tokens: List[str]) -> List[str]:
        for d in self.decoders:
            tokens = d.decode_chain(tokens)
        return tokens

    def __getitem__(self, i):
        return self.decoders[i]

    def __len__(self):
        return len(self.decoders)


class BPEDecoder(Decoder):
    """Replace end-of-word suffix by spaces (reference `decoders/bpe.rs:10`)."""

    def __init__(self, suffix: str = "</w>"):
        self.suffix = suffix

    def decode_chain(self, tokens: List[str]) -> List[str]:
        n = len(tokens) - 1
        return [
            token.replace(self.suffix, "" if i == n else " ")
            for i, token in enumerate(tokens)
        ]


def wordpiece_cleanup(s: str) -> str:
    """(reference `decoders/wordpiece.rs:31-44`)"""
    return (
        s.replace(" .", ".")
        .replace(" ?", "?")
        .replace(" !", "!")
        .replace(" ,", ",")
        .replace(" ' ", "'")
        .replace(" n't", "n't")
        .replace(" 'm", "'m")
        .replace(" do not", " don't")
        .replace(" 's", "'s")
        .replace(" 've", "'ve")
        .replace(" 're", "'re")
    )


class WordPiece(Decoder):
    def __init__(self, prefix: str = "##", cleanup: bool = True):
        self.prefix = prefix
        self.cleanup = cleanup

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out = []
        for i, token in enumerate(tokens):
            if i != 0:
                if token.startswith(self.prefix):
                    token = token[len(self.prefix):]
                else:
                    token = " " + token
            if self.cleanup:
                token = wordpiece_cleanup(token)
            out.append(token)
        return out


class ByteFallback(Decoder):
    """Reassemble `<0xXX>` byte tokens (reference `decoders/byte_fallback.rs:11`)."""

    def decode_chain(self, tokens: List[str]) -> List[str]:
        new_tokens: List[str] = []
        previous_bytes: List[int] = []

        def flush():
            if previous_bytes:
                try:
                    new_tokens.append(bytes(previous_bytes).decode("utf-8"))
                except UnicodeDecodeError:
                    new_tokens.extend(["�"] * len(previous_bytes))
                previous_bytes.clear()

        for token in tokens:
            byte = None
            if len(token) == 6 and token.startswith("<0x") and token.endswith(">"):
                try:
                    byte = int(token[3:5], 16)
                except ValueError:
                    byte = None
            if byte is not None:
                previous_bytes.append(byte)
            else:
                flush()
                new_tokens.append(token)
        flush()
        return new_tokens


class CTC(Decoder):
    """Dedup + pad removal (reference `decoders/ctc.rs:14`)."""

    def __init__(
        self,
        pad_token: str = "<pad>",
        word_delimiter_token: str = "|",
        cleanup: bool = True,
    ):
        self.pad_token = pad_token
        self.word_delimiter_token = word_delimiter_token
        self.cleanup = cleanup

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out = []
        prev = None
        for token in tokens:
            if token == prev:
                continue
            prev = token
            replaced = token.replace(self.pad_token, "")
            if self.cleanup:
                replaced = wordpiece_cleanup(replaced).replace(
                    self.word_delimiter_token, " "
                )
            if replaced:
                out.append(replaced)
        return out


class Fuse(Decoder):
    def decode_chain(self, tokens: List[str]) -> List[str]:
        return ["".join(tokens)]


class Strip(Decoder):
    """Strip up to `start`/`stop` copies of `content` per token
    (reference `decoders/strip.rs:11`)."""

    def __init__(self, content: str = " ", start: int = 0, stop: int = 0):
        self.content = content
        self.start = start
        self.stop = stop

    def decode_chain(self, tokens: List[str]) -> List[str]:
        out = []
        for token in tokens:
            start_cut = 0
            for i, c in enumerate(token):
                if i >= self.start or c != self.content:
                    break
                start_cut = i + 1
            stop_cut = len(token)
            for i, c in enumerate(reversed(token)):
                if i >= self.stop or c != self.content:
                    break
                stop_cut = len(token) - i - 1
            out.append(token[start_cut:stop_cut])
        return out


class Replace(Decoder):
    """Pattern -> content replacement over token strings
    (reference `normalizers/replace.rs:82-96`, Decoder role)."""

    def __init__(self, pattern, content: str):
        from ..normalizers import Replace as _ReplaceNormalizer

        self._norm = _ReplaceNormalizer(pattern, content)
        self.pattern_kind = self._norm.pattern_kind
        self.pattern_str = self._norm.pattern_str
        self.content = content

    def decode_chain(self, tokens: List[str]) -> List[str]:
        from ..normalized import NormalizedString

        out = []
        for token in tokens:
            n = NormalizedString(token)
            self._norm.normalize(n)
            out.append(n.get())
        return out


from ..pre_tokenizers.byte_level import ByteLevel  # noqa: E402  (decoder role)
from ..pre_tokenizers.metaspace import Metaspace  # noqa: E402  (decoder role)

# These play the Decoder role with the default join-chain decode.
ByteLevel.decode = Decoder.decode
Metaspace.decode = Decoder.decode

__all__ = [
    "Decoder",
    "Sequence",
    "BPEDecoder",
    "WordPiece",
    "ByteFallback",
    "CTC",
    "Fuse",
    "Strip",
    "Replace",
    "ByteLevel",
    "Metaspace",
    "wordpiece_cleanup",
]
