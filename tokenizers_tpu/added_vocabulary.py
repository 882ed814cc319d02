"""AddedVocabulary: user-added & special tokens matched before the model.

Reference `tokenizers/src/tokenizer/added_vocabulary.rs`: two leftmost-longest
multi-pattern matchers (non-normalized and normalized patterns), id allocation
above the model vocab, `single_word`/`lstrip`/`rstrip`/`normalized` semantics,
and the `encode_special_tokens` toggle.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import regex as _re

from .normalized import NormalizedString, char_to_byte_offsets
from .pretokenized import PreTokenizedString, Token

# rust-regex \w (includes Join_Control) — these mirror `added_vocabulary.rs`
# which uses the rust `regex` crate, not onig.
_WORD = r"[\p{Alphabetic}\p{M}\p{Nd}\p{Pc}\p{Join_Control}]"
_SPACE = ("[\\t\\n\\x0B\\f\\r \\x85\\xA0\\u1680\\u2000-\\u200A" "\\u2028\\u2029\\u202F\\u205F\\u3000]")
_STARTS_WITH_WORD = _re.compile(rf"^{_WORD}")
_ENDS_WITH_WORD = _re.compile(rf"{_WORD}$")
_SPACES_AT_START = _re.compile(rf"^{_SPACE}*")
_SPACES_AT_END = _re.compile(rf"{_SPACE}*$")


class AddedToken:
    __slots__ = ("content", "single_word", "lstrip", "rstrip", "normalized", "special")

    def __init__(
        self,
        content: str = "",
        single_word: bool = False,
        lstrip: bool = False,
        rstrip: bool = False,
        normalized: Optional[bool] = None,
        special: bool = False,
    ):
        self.content = content
        self.single_word = single_word
        self.lstrip = lstrip
        self.rstrip = rstrip
        # special tokens are not normalized by default
        self.normalized = (not special) if normalized is None else normalized
        self.special = special

    def __eq__(self, other):
        if isinstance(other, str):
            return self.content == other
        return isinstance(other, AddedToken) and (
            self.content,
            self.single_word,
            self.lstrip,
            self.rstrip,
            self.normalized,
            self.special,
        ) == (
            other.content,
            other.single_word,
            other.lstrip,
            other.rstrip,
            other.normalized,
            other.special,
        )

    def __hash__(self):
        return hash(self.content)

    def __repr__(self):
        return (
            f"AddedToken({self.content!r}, single_word={self.single_word}, "
            f"lstrip={self.lstrip}, rstrip={self.rstrip}, "
            f"normalized={self.normalized}, special={self.special})"
        )

    def __str__(self):
        return self.content


class _Matcher:
    """Leftmost-longest multi-pattern matcher (Aho-Corasick equivalent):
    regex alternation with longest-first alternatives has the same match
    semantics for literal patterns."""

    __slots__ = ("patterns", "ids", "_re", "_order", "_pattern_by_text")

    def __init__(self, patterns: List[str], ids: List[int]):
        self.patterns = patterns
        self.ids = ids
        if patterns:
            order = sorted(range(len(patterns)), key=lambda i: -len(patterns[i]))
            alternation = "|".join(_re.escape(patterns[i]) for i in order)
            self._order = order
            self._re = _re.compile(alternation)
            self._pattern_by_text = {}
            for i, p in enumerate(patterns):
                # first pattern with given text wins (duplicates impossible:
                # added_tokens_map is keyed by content)
                self._pattern_by_text.setdefault(p, i)
        else:
            self._re = None

    def find_iter(self, s: str):
        """Yields (pattern_index, char_start, char_end)."""
        if self._re is None:
            return
        for m in self._re.finditer(s):
            yield (self._pattern_by_text[m.group()], m.start(), m.end())


class AddedVocabulary:
    def __init__(self):
        self.added_tokens_map: Dict[str, int] = {}
        self.added_tokens_map_r: Dict[int, AddedToken] = {}
        self.added_tokens: List[AddedToken] = []
        self.special_tokens: List[AddedToken] = []
        self.special_tokens_set: set = set()
        self.split_trie: Tuple[_Matcher, List[int]] = (_Matcher([], []), [])
        self.split_normalized_trie: Tuple[_Matcher, List[int]] = (_Matcher([], []), [])
        self.encode_special_tokens: bool = False

    def __len__(self):
        return len(self.added_tokens_map)

    def get_added_tokens_decoder(self) -> Dict[int, AddedToken]:
        return dict(self.added_tokens_map_r)

    def get_vocab(self) -> Dict[str, int]:
        return dict(self.added_tokens_map)

    def token_to_id(self, token: str, model) -> Optional[int]:
        id = self.added_tokens_map.get(token)
        if id is not None:
            return id
        return model.token_to_id(token)

    def id_to_token(self, id: int, model) -> Optional[str]:
        tok = self.added_tokens_map_r.get(id)
        if tok is not None:
            return tok.content
        return model.id_to_token(id)

    def is_special_token(self, token: str) -> bool:
        return token in self.special_tokens_set

    # ------------------------------------------------------------------ build

    def add_special_tokens(self, tokens: List[AddedToken], model, normalizer) -> int:
        return self.add_tokens(tokens, model, normalizer)

    def add_tokens(self, tokens: List[AddedToken], model, normalizer) -> int:
        """(reference `added_vocabulary.rs:258-316`)"""
        for token in tokens:
            if (
                token.special
                and token.content
                and token.content not in self.special_tokens_set
            ):
                self.special_tokens.append(token)
                self.special_tokens_set.add(token.content)

        ignored = 0
        for token in tokens:
            if not token.content or any(
                val == token for val in self.added_tokens_map_r.values()
            ):
                ignored += 1
                continue
            new_id = self.token_to_id(token.content, model)
            if new_id is None:
                if self.added_tokens_map:
                    mx = max(self.added_tokens_map.values())
                    if mx >= model.get_vocab_size() or model.get_vocab_size() == 0:
                        new_id = mx + 1
                    else:
                        new_id = model.get_vocab_size()
                else:
                    new_id = model.get_vocab_size()
            self.added_tokens_map[token.content] = new_id
            self.added_tokens_map_r[new_id] = token
            if token.content not in self.special_tokens_set:
                self.added_tokens.append(token)

        self.refresh_added_tokens(model, normalizer)
        return len(tokens) - ignored

    def refresh_added_tokens(self, model, normalizer) -> None:
        """(reference `added_vocabulary.rs:323-360`)"""
        normalized = []
        non_normalized = []
        for token in self.special_tokens + self.added_tokens:
            id = self.token_to_id(token.content, model)
            if id is None:
                raise RuntimeError("Missing additional token")
            (normalized if token.normalized else non_normalized).append((token, id))

        tokens, ids = (
            [t.content for t, _ in non_normalized],
            [i for _, i in non_normalized],
        )
        self.split_trie = (_Matcher(tokens, ids), ids)

        npatterns = []
        nids = []
        for token, id in normalized:
            content = NormalizedString(token.content)
            if normalizer is not None:
                normalizer.normalize(content)
            npatterns.append(content.get())
            nids.append(id)
        self.split_normalized_trie = (_Matcher(npatterns, nids), nids)

    # ------------------------------------------------------------------ match

    def _find_matches(self, sentence: str, split_re) -> List[Tuple[Optional[int], Tuple[int, int]]]:
        """Byte-offset splits covering the whole sentence
        (reference `added_vocabulary.rs:367-420`)."""
        if not sentence:
            return [(None, (0, 0))]

        matcher, ids = split_re
        cb = char_to_byte_offsets(sentence)
        sb_len = cb[-1]

        start_offset = 0
        splits: List[Tuple[Optional[int], Tuple[int, int]]] = []
        for pat_idx, cstart, cend in matcher.find_iter(sentence):
            start = cb[cstart]
            stop = cb[cend]
            id = ids[pat_idx]
            added_token = self.added_tokens_map_r[id]

            if self.encode_special_tokens and added_token.content in self.special_tokens_set:
                continue

            if added_token.single_word:
                start_space = cstart == 0 or not _ENDS_WITH_WORD.search(
                    sentence[:cstart]
                )
                stop_space = cend == len(sentence) or not _STARTS_WITH_WORD.search(
                    sentence[cend:]
                )
                if not stop_space or not start_space:
                    continue
            if added_token.lstrip:
                m = _SPACES_AT_END.search(sentence[:cstart])
                newstart = cb[m.start()] if m else cb[cstart]
                start = max(newstart, start_offset)
            if added_token.rstrip:
                m = _SPACES_AT_START.match(sentence[cend:])
                extra = m.end() if m else 0
                stop = cb[cend + extra]
            if start_offset < start:
                splits.append((None, (start_offset, start)))
            splits.append((id, (start, stop)))
            start_offset = stop

        if start_offset != sb_len:
            splits.append((None, (start_offset, sb_len)))
        return splits

    def _split_with_indices(self, sentence: NormalizedString, split_re):
        out = []
        for id, (bstart, bstop) in self._find_matches(sentence.get(), split_re):
            sliced = sentence.slice(bstart, bstop, "normalized")
            if sliced is None:
                raise RuntimeError("AddedVocabulary bad split")
            if id is not None:
                value = sliced.get()
                ln = len(value.encode("utf-8"))
                out.append((sliced, [Token(id, value, (0, ln))]))
            else:
                out.append((sliced, None))
        return out

    def extract_and_normalize(self, normalizer, sequence: str) -> PreTokenizedString:
        """(reference `added_vocabulary.rs:455-521`)"""
        pretokenized = PreTokenizedString(sequence)
        pretokenized.split(
            lambda i, seq: self._split_with_indices(seq, self.split_trie)
        )

        def norm_and_split(i, seq):
            if normalizer is not None:
                normalizer.normalize(seq)
            return self._split_with_indices(seq, self.split_normalized_trie)

        pretokenized.split(norm_and_split)
        return pretokenized
