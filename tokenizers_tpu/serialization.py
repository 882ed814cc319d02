"""tokenizer.json (de)serialization — byte-compatible with the reference
format (reference `tokenizers/src/tokenizer/serialization.rs:13-47` and each
component's serde impl): `{version: "1.0", truncation, padding, added_tokens,
normalizer, pre_tokenizer, post_processor, decoder, model}` with
internally-"type"-tagged component objects.
"""

from __future__ import annotations

import base64
from typing import Any, Dict, List, Optional

from . import decoders as D
from . import normalizers as N
from . import pre_tokenizers as P
from . import processors as PP
from .added_vocabulary import AddedToken
from .errors import SerdeError
from .models import BPE, Unigram, WordLevel, WordPiece
from .normalized import (
    CONTIGUOUS,
    ISOLATED,
    MERGED_WITH_NEXT,
    MERGED_WITH_PREVIOUS,
    REMOVED,
)
from .utils.padding import BATCH_LONGEST, PaddingParams
from .utils.truncation import TruncationParams

# ---------------------------------------------------------------- behaviors

_BEHAVIOR_TO_JSON = {
    REMOVED: "Removed",
    ISOLATED: "Isolated",
    MERGED_WITH_PREVIOUS: "MergedWithPrevious",
    MERGED_WITH_NEXT: "MergedWithNext",
    CONTIGUOUS: "Contiguous",
}
_BEHAVIOR_FROM_JSON = {v: k for k, v in _BEHAVIOR_TO_JSON.items()}


def _pattern_to_json(kind: str, s: str) -> Dict[str, str]:
    return {kind: s}


def _pattern_from_json(d: Dict[str, str]):
    if "String" in d:
        return d["String"]
    if "Regex" in d:
        return ("Regex", d["Regex"])
    raise SerdeError(f"Unknown pattern: {d}")


# ---------------------------------------------------------------- normalizers


def normalizer_to_dict(n) -> Optional[Dict[str, Any]]:
    if n is None:
        return None
    if isinstance(n, N.Sequence):
        return {
            "type": "Sequence",
            "normalizers": [normalizer_to_dict(x) for x in n.normalizers],
        }
    if isinstance(n, N.BertNormalizer):
        return {
            "type": "BertNormalizer",
            "clean_text": n.clean_text,
            "handle_chinese_chars": n.handle_chinese_chars,
            "strip_accents": n.strip_accents,
            "lowercase": n.lowercase,
        }
    if isinstance(n, N.NFD):
        return {"type": "NFD"}
    if isinstance(n, N.NFKD):
        return {"type": "NFKD"}
    if isinstance(n, N.NFC):
        return {"type": "NFC"}
    if isinstance(n, N.NFKC):
        return {"type": "NFKC"}
    if isinstance(n, N.Nmt):
        return {"type": "Nmt"}
    if isinstance(n, N.Lowercase):
        return {"type": "Lowercase"}
    if isinstance(n, N.Strip):
        return {"type": "Strip", "strip_left": n.strip_left, "strip_right": n.strip_right}
    if isinstance(n, N.StripAccents):
        return {"type": "StripAccents"}
    if isinstance(n, N.Prepend):
        return {"type": "Prepend", "prepend": n.prepend}
    if isinstance(n, N.Replace):
        return {
            "type": "Replace",
            "pattern": _pattern_to_json(n.pattern_kind, n.pattern_str),
            "content": n.content,
        }
    if isinstance(n, N.Precompiled):
        return {
            "type": "Precompiled",
            "precompiled_charsmap": base64.b64encode(n.precompiled_charsmap).decode(
                "ascii"
            ),
        }
    if isinstance(n, N.ByteLevel):
        return {"type": "ByteLevel"}
    raise SerdeError(f"Cannot serialize normalizer {n!r}")


def normalizer_from_dict(d) -> Optional[Any]:
    if d is None:
        return None
    t = d.get("type")
    if t == "Sequence":
        return N.Sequence([normalizer_from_dict(x) for x in d["normalizers"]])
    if t == "BertNormalizer":
        return N.BertNormalizer(
            d.get("clean_text", True),
            d.get("handle_chinese_chars", True),
            d.get("strip_accents"),
            d.get("lowercase", True),
        )
    if t == "NFD":
        return N.NFD()
    if t == "NFKD":
        return N.NFKD()
    if t == "NFC":
        return N.NFC()
    if t == "NFKC":
        return N.NFKC()
    if t == "Nmt":
        return N.Nmt()
    if t == "Lowercase":
        return N.Lowercase()
    if t == "Strip":
        return N.Strip(d.get("strip_left", True), d.get("strip_right", True))
    if t == "StripAccents":
        return N.StripAccents()
    if t == "Prepend":
        return N.Prepend(d["prepend"])
    if t == "Replace":
        return N.Replace(_pattern_from_json(d["pattern"]), d["content"])
    if t == "Precompiled":
        return N.Precompiled(base64.b64decode(d["precompiled_charsmap"]))
    if t == "ByteLevel":
        return N.ByteLevel()
    raise SerdeError(f"Unknown normalizer type: {t}")


# -------------------------------------------------------------- pretokenizers


def pre_tokenizer_to_dict(p) -> Optional[Dict[str, Any]]:
    if p is None:
        return None
    if isinstance(p, P.Sequence):
        return {
            "type": "Sequence",
            "pretokenizers": [pre_tokenizer_to_dict(x) for x in p.pretokenizers],
        }
    if isinstance(p, P.ByteLevel):
        return {
            "type": "ByteLevel",
            "add_prefix_space": p.add_prefix_space,
            "trim_offsets": p.trim_offsets,
            "use_regex": p.use_regex,
        }
    if isinstance(p, P.BertPreTokenizer):
        return {"type": "BertPreTokenizer"}
    if isinstance(p, P.Whitespace):
        return {"type": "Whitespace"}
    if isinstance(p, P.WhitespaceSplit):
        return {"type": "WhitespaceSplit"}
    if isinstance(p, P.Metaspace):
        return {
            "type": "Metaspace",
            "replacement": p.replacement,
            "prepend_scheme": p.prepend_scheme,
            "split": p.split,
        }
    if isinstance(p, P.Split):
        return {
            "type": "Split",
            "pattern": _pattern_to_json(p.pattern_kind, p.pattern_str),
            "behavior": _BEHAVIOR_TO_JSON[p.behavior],
            "invert": p.invert,
        }
    if isinstance(p, P.CharDelimiterSplit):
        return {"type": "CharDelimiterSplit", "delimiter": p.delimiter}
    if isinstance(p, P.Punctuation):
        return {"type": "Punctuation", "behavior": _BEHAVIOR_TO_JSON[p.behavior]}
    if isinstance(p, P.Digits):
        return {"type": "Digits", "individual_digits": p.individual_digits}
    if isinstance(p, P.UnicodeScripts):
        return {"type": "UnicodeScripts"}
    if isinstance(p, P.FixedLength):
        return {"type": "FixedLength", "length": p.length}
    raise SerdeError(f"Cannot serialize pre-tokenizer {p!r}")


def pre_tokenizer_from_dict(d) -> Optional[Any]:
    if d is None:
        return None
    t = d.get("type")
    if t == "Sequence":
        return P.Sequence([pre_tokenizer_from_dict(x) for x in d["pretokenizers"]])
    if t == "ByteLevel":
        return P.ByteLevel(
            d.get("add_prefix_space", True),
            d.get("trim_offsets", True),
            d.get("use_regex", True),
        )
    if t == "BertPreTokenizer":
        return P.BertPreTokenizer()
    if t == "Whitespace":
        return P.Whitespace()
    if t == "WhitespaceSplit":
        return P.WhitespaceSplit()
    if t == "Metaspace":
        prepend_scheme = d.get("prepend_scheme", "always")
        if d.get("add_prefix_space") is False:
            prepend_scheme = "never"
        elif d.get("add_prefix_space") is True and "prepend_scheme" not in d:
            prepend_scheme = "always"
        return P.Metaspace(d["replacement"], prepend_scheme, d.get("split", True))
    if t == "Split":
        return P.Split(
            _pattern_from_json(d["pattern"]),
            _BEHAVIOR_FROM_JSON[d["behavior"]],
            d.get("invert", False),
        )
    if t == "CharDelimiterSplit":
        return P.CharDelimiterSplit(d["delimiter"])
    if t == "Punctuation":
        return P.Punctuation(_BEHAVIOR_FROM_JSON[d.get("behavior", "Isolated")])
    if t == "Digits":
        return P.Digits(d.get("individual_digits", False))
    if t == "UnicodeScripts":
        return P.UnicodeScripts()
    if t == "FixedLength":
        return P.FixedLength(d.get("length", 5))
    raise SerdeError(f"Unknown pre-tokenizer type: {t}")


# -------------------------------------------------------------------- models


def model_to_dict(m) -> Dict[str, Any]:
    if isinstance(m, BPE):
        vocab_r = m.vocab_r
        ordered_vocab = {vocab_r[i]: i for i in sorted(vocab_r)}
        ranked = sorted(
            ((rank, pair) for pair, (rank, _) in m.merges.items()), key=lambda x: x[0]
        )
        merges = [[vocab_r[a], vocab_r[b]] for _, (a, b) in ranked]
        return {
            "type": "BPE",
            "dropout": m.dropout,
            "unk_token": m.unk_token,
            "continuing_subword_prefix": m.continuing_subword_prefix,
            "end_of_word_suffix": m.end_of_word_suffix,
            "fuse_unk": m.fuse_unk,
            "byte_fallback": m.byte_fallback,
            "ignore_merges": m.ignore_merges,
            "vocab": ordered_vocab,
            "merges": merges,
        }
    if isinstance(m, WordPiece):
        vocab_r = m.vocab_r
        return {
            "type": "WordPiece",
            "unk_token": m.unk_token,
            "continuing_subword_prefix": m.continuing_subword_prefix,
            "max_input_chars_per_word": m.max_input_chars_per_word,
            "vocab": {vocab_r[i]: i for i in sorted(vocab_r)},
        }
    if isinstance(m, WordLevel):
        vocab_r = m.vocab_r
        return {
            "type": "WordLevel",
            "vocab": {vocab_r[i]: i for i in sorted(vocab_r)},
            "unk_token": m.unk_token,
        }
    if isinstance(m, Unigram):
        return {
            "type": "Unigram",
            "unk_id": m.unk_id,
            "vocab": [[t, s] for t, s in m.vocab],
            "byte_fallback": m.byte_fallback,
        }
    raise SerdeError(f"Cannot serialize model {m!r}")


def model_from_dict(d) -> Any:
    t = d.get("type")
    if t is None:
        # legacy untagged: guess by fields
        if "merges" in d:
            t = "BPE"
        elif "max_input_chars_per_word" in d or "continuing_subword_prefix" in d:
            t = "WordPiece"
        elif "unk_id" in d:
            t = "Unigram"
        else:
            t = "WordLevel"
    if t == "BPE":
        merges_raw = d.get("merges", [])
        merges = []
        for m in merges_raw:
            if isinstance(m, str):
                a, b = m.split(" ", 1)
                merges.append((a, b))
            else:
                merges.append((m[0], m[1]))
        return BPE(
            vocab=d.get("vocab", {}),
            merges=merges,
            dropout=d.get("dropout"),
            unk_token=d.get("unk_token"),
            continuing_subword_prefix=d.get("continuing_subword_prefix"),
            end_of_word_suffix=d.get("end_of_word_suffix"),
            fuse_unk=d.get("fuse_unk", False),
            byte_fallback=d.get("byte_fallback", False),
            ignore_merges=d.get("ignore_merges", False),
        )
    if t == "WordPiece":
        return WordPiece(
            vocab=d.get("vocab", {}),
            unk_token=d.get("unk_token", "[UNK]"),
            continuing_subword_prefix=d.get("continuing_subword_prefix", "##"),
            max_input_chars_per_word=d.get("max_input_chars_per_word", 100),
        )
    if t == "WordLevel":
        return WordLevel(vocab=d.get("vocab", {}), unk_token=d.get("unk_token", "<unk>"))
    if t == "Unigram":
        return Unigram(
            vocab=[(v[0], v[1]) for v in d.get("vocab", [])],
            unk_id=d.get("unk_id"),
            byte_fallback=d.get("byte_fallback", False),
        )
    raise SerdeError(f"Unknown model type: {t}")


# ---------------------------------------------------------------- processors


def processor_to_dict(p) -> Optional[Dict[str, Any]]:
    if p is None:
        return None
    if isinstance(p, PP.Sequence):
        return {
            "type": "Sequence",
            "processors": [processor_to_dict(x) for x in p.processors],
        }
    if isinstance(p, PP.TemplateProcessing):
        def piece_to_dict(piece):
            if piece.kind == "Sequence":
                return {"Sequence": {"id": piece.id, "type_id": piece.type_id}}
            return {"SpecialToken": {"id": piece.id, "type_id": piece.type_id}}

        return {
            "type": "TemplateProcessing",
            "single": [piece_to_dict(x) for x in p.single.pieces],
            "pair": [piece_to_dict(x) for x in p.pair.pieces],
            "special_tokens": {
                k: {"id": v.id, "ids": v.ids, "tokens": v.tokens}
                for k, v in sorted(p.special_tokens.items())
            },
        }
    if isinstance(p, PP.BertProcessing):
        return {"type": "BertProcessing", "sep": list(p.sep), "cls": list(p.cls)}
    if isinstance(p, PP.RobertaProcessing):
        return {
            "type": "RobertaProcessing",
            "sep": list(p.sep),
            "cls": list(p.cls),
            "trim_offsets": p.trim_offsets,
            "add_prefix_space": p.add_prefix_space,
        }
    if isinstance(p, P.ByteLevel):
        return {
            "type": "ByteLevel",
            "add_prefix_space": p.add_prefix_space,
            "trim_offsets": p.trim_offsets,
            "use_regex": p.use_regex,
        }
    raise SerdeError(f"Cannot serialize processor {p!r}")


def processor_from_dict(d) -> Optional[Any]:
    if d is None:
        return None
    t = d.get("type")
    if t == "Sequence":
        return PP.Sequence([processor_from_dict(x) for x in d["processors"]])
    if t == "TemplateProcessing":
        def piece_from_dict(x):
            if "Sequence" in x:
                return PP.Piece("Sequence", x["Sequence"]["id"], x["Sequence"]["type_id"])
            return PP.Piece(
                "SpecialToken", x["SpecialToken"]["id"], x["SpecialToken"]["type_id"]
            )

        single = PP.Template([piece_from_dict(x) for x in d.get("single", [])])
        pair = PP.Template([piece_from_dict(x) for x in d.get("pair", [])])
        tokens = [
            PP.SpecialToken(v["id"], v["ids"], v["tokens"])
            for v in d.get("special_tokens", {}).values()
        ]
        obj = PP.TemplateProcessing.__new__(PP.TemplateProcessing)
        obj.single = single
        obj.pair = pair
        obj.special_tokens = {st.id: st for st in tokens}
        obj.added_single = obj._count_added(single)
        obj.added_pair = obj._count_added(pair)
        return obj
    if t == "BertProcessing":
        return PP.BertProcessing(tuple(d["sep"]), tuple(d["cls"]))
    if t == "RobertaProcessing":
        return PP.RobertaProcessing(
            tuple(d["sep"]),
            tuple(d["cls"]),
            d.get("trim_offsets", True),
            d.get("add_prefix_space", True),
        )
    if t == "ByteLevel":
        return P.ByteLevel(
            d.get("add_prefix_space", True),
            d.get("trim_offsets", True),
            d.get("use_regex", True),
        )
    raise SerdeError(f"Unknown processor type: {t}")


# ------------------------------------------------------------------ decoders


def decoder_to_dict(dec) -> Optional[Dict[str, Any]]:
    if dec is None:
        return None
    if isinstance(dec, D.Sequence):
        return {
            "type": "Sequence",
            "decoders": [decoder_to_dict(x) for x in dec.decoders],
        }
    if isinstance(dec, P.ByteLevel):
        return {
            "type": "ByteLevel",
            "add_prefix_space": dec.add_prefix_space,
            "trim_offsets": dec.trim_offsets,
            "use_regex": dec.use_regex,
        }
    if isinstance(dec, P.Metaspace):
        return {
            "type": "Metaspace",
            "replacement": dec.replacement,
            "prepend_scheme": dec.prepend_scheme,
            "split": dec.split,
        }
    if isinstance(dec, D.WordPiece):
        return {"type": "WordPiece", "prefix": dec.prefix, "cleanup": dec.cleanup}
    if isinstance(dec, D.BPEDecoder):
        return {"type": "BPEDecoder", "suffix": dec.suffix}
    if isinstance(dec, D.ByteFallback):
        return {"type": "ByteFallback"}
    if isinstance(dec, D.Fuse):
        return {"type": "Fuse"}
    if isinstance(dec, D.Strip):
        return {
            "type": "Strip",
            "content": dec.content,
            "start": dec.start,
            "stop": dec.stop,
        }
    if isinstance(dec, D.CTC):
        return {
            "type": "CTC",
            "pad_token": dec.pad_token,
            "word_delimiter_token": dec.word_delimiter_token,
            "cleanup": dec.cleanup,
        }
    if isinstance(dec, D.Replace):
        return {
            "type": "Replace",
            "pattern": _pattern_to_json(dec.pattern_kind, dec.pattern_str),
            "content": dec.content,
        }
    raise SerdeError(f"Cannot serialize decoder {dec!r}")


def decoder_from_dict(d) -> Optional[Any]:
    if d is None:
        return None
    t = d.get("type")
    if t == "Sequence":
        return D.Sequence([decoder_from_dict(x) for x in d["decoders"]])
    if t == "ByteLevel":
        return P.ByteLevel(
            d.get("add_prefix_space", True),
            d.get("trim_offsets", True),
            d.get("use_regex", True),
        )
    if t == "Metaspace":
        prepend_scheme = d.get("prepend_scheme", "always")
        if d.get("add_prefix_space") is False:
            prepend_scheme = "never"
        return P.Metaspace(d["replacement"], prepend_scheme, d.get("split", True))
    if t == "WordPiece":
        return D.WordPiece(d.get("prefix", "##"), d.get("cleanup", True))
    if t == "BPEDecoder":
        return D.BPEDecoder(d.get("suffix", "</w>"))
    if t == "ByteFallback":
        return D.ByteFallback()
    if t == "Fuse":
        return D.Fuse()
    if t == "Strip":
        return D.Strip(d.get("content", " "), d.get("start", 0), d.get("stop", 0))
    if t == "CTC":
        return D.CTC(
            d.get("pad_token", "<pad>"),
            d.get("word_delimiter_token", "|"),
            d.get("cleanup", True),
        )
    if t == "Replace":
        return D.Replace(_pattern_from_json(d["pattern"]), d["content"])
    raise SerdeError(f"Unknown decoder type: {t}")


# ----------------------------------------------------------- trunc / padding


def truncation_to_dict(t: Optional[TruncationParams]):
    if t is None:
        return None
    return {
        "direction": "Left" if t.direction == "left" else "Right",
        "max_length": t.max_length,
        "strategy": {
            "longest_first": "LongestFirst",
            "only_first": "OnlyFirst",
            "only_second": "OnlySecond",
        }[t.strategy],
        "stride": t.stride,
    }


def truncation_from_dict(d) -> Optional[TruncationParams]:
    if d is None:
        return None
    return TruncationParams(
        max_length=d.get("max_length", 512),
        strategy={
            "LongestFirst": "longest_first",
            "OnlyFirst": "only_first",
            "OnlySecond": "only_second",
        }[d.get("strategy", "LongestFirst")],
        stride=d.get("stride", 0),
        direction=d.get("direction", "Right").lower(),
    )


def padding_to_dict(p: Optional[PaddingParams]):
    if p is None:
        return None
    return {
        "strategy": "BatchLongest"
        if p.strategy == BATCH_LONGEST
        else {"Fixed": int(p.strategy)},
        "direction": "Left" if p.direction == "left" else "Right",
        "pad_to_multiple_of": p.pad_to_multiple_of,
        "pad_id": p.pad_id,
        "pad_type_id": p.pad_type_id,
        "pad_token": p.pad_token,
    }


def padding_from_dict(d) -> Optional[PaddingParams]:
    if d is None:
        return None
    strategy = d.get("strategy", "BatchLongest")
    if isinstance(strategy, dict):
        strategy = strategy["Fixed"]
    else:
        strategy = BATCH_LONGEST
    return PaddingParams(
        strategy=strategy,
        direction=d.get("direction", "Right").lower(),
        pad_to_multiple_of=d.get("pad_to_multiple_of"),
        pad_id=d.get("pad_id", 0),
        pad_type_id=d.get("pad_type_id", 0),
        pad_token=d.get("pad_token", "[PAD]"),
    )


# ------------------------------------------------------------------- toplevel


def tokenizer_to_dict(tok) -> Dict[str, Any]:
    added_tokens = []
    for id in sorted(tok.added_vocabulary.added_tokens_map_r):
        t = tok.added_vocabulary.added_tokens_map_r[id]
        added_tokens.append(
            {
                "id": id,
                "content": t.content,
                "single_word": t.single_word,
                "lstrip": t.lstrip,
                "rstrip": t.rstrip,
                "normalized": t.normalized,
                "special": t.special,
            }
        )
    return {
        "version": "1.0",
        "truncation": truncation_to_dict(tok.truncation),
        "padding": padding_to_dict(tok.padding),
        "added_tokens": added_tokens,
        "normalizer": normalizer_to_dict(tok.normalizer),
        "pre_tokenizer": pre_tokenizer_to_dict(tok.pre_tokenizer),
        "post_processor": processor_to_dict(tok.post_processor),
        "decoder": decoder_to_dict(tok.decoder),
        "model": model_to_dict(tok.model),
    }


def tokenizer_from_dict(d: Dict[str, Any]):
    from .tokenizer import Tokenizer

    tok = Tokenizer(model_from_dict(d["model"]))
    tok.normalizer = normalizer_from_dict(d.get("normalizer"))
    tok.pre_tokenizer = pre_tokenizer_from_dict(d.get("pre_tokenizer"))
    tok.post_processor = processor_from_dict(d.get("post_processor"))
    tok.decoder = decoder_from_dict(d.get("decoder"))
    tok.truncation = truncation_from_dict(d.get("truncation"))
    tok.padding = padding_from_dict(d.get("padding"))

    added = d.get("added_tokens", [])
    special = [t for t in added if t.get("special")]
    non_special = [t for t in added if not t.get("special")]

    def mk(t):
        return AddedToken(
            t["content"],
            single_word=t.get("single_word", False),
            lstrip=t.get("lstrip", False),
            rstrip=t.get("rstrip", False),
            normalized=t.get("normalized", not t.get("special", False)),
            special=t.get("special", False),
        )

    # Add in id order so ids round-trip; ids in the file are authoritative.
    for t in sorted(added, key=lambda x: x["id"]):
        token = mk(t)
        expected_id = t["id"]
        # mirror reference behavior: ids are assigned by add_tokens; the file's
        # ids must match either the model vocab or the next added slot.
        tok.added_vocabulary.add_tokens([token], tok.model, tok.normalizer)
        actual = tok.added_vocabulary.token_to_id(token.content, tok.model)
        if actual != expected_id:
            # force the recorded id (reference deserializes the map directly)
            tok.added_vocabulary.added_tokens_map[token.content] = expected_id
            for k in [
                k
                for k, v in tok.added_vocabulary.added_tokens_map_r.items()
                if v.content == token.content and k != expected_id
            ]:
                del tok.added_vocabulary.added_tokens_map_r[k]
            tok.added_vocabulary.added_tokens_map_r[expected_id] = token
            tok.added_vocabulary.refresh_added_tokens(tok.model, tok.normalizer)
    _ = special, non_special
    return tok


def trainer_from_json(payload: str):
    """Build a trainer from a JSON config {"type": "BpeTrainer", ...kwargs}
    — the C-ABI / Node-binding constructor surface (reference C binding
    passes component configs as JSON payloads, `bindings/c/src/lib.rs`)."""
    import json as _json

    from . import trainers as T

    d = _json.loads(payload)
    kind = d.pop("type")
    cls = {
        "BpeTrainer": T.BpeTrainer,
        "WordPieceTrainer": T.WordPieceTrainer,
        "WordLevelTrainer": T.WordLevelTrainer,
        "UnigramTrainer": T.UnigramTrainer,
    }.get(kind)
    if cls is None:
        raise SerdeError(f"unknown trainer type {kind!r}")
    if "special_tokens" in d:
        d["special_tokens"] = [
            AddedToken(t, special=True) if isinstance(t, str) else AddedToken(**t)
            for t in d["special_tokens"]
        ]
    return cls(**d)
