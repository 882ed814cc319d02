"""BpeTrainer: max-heap merge selection with incremental pair counts.

Host-exact implementation of reference `tokenizers/src/models/bpe/trainer.rs`:
word counting, alphabet computation (`limit_alphabet` / `initial_alphabet`),
(count desc, pair asc) merge ordering with lazy count revalidation, parallel
merge application with incremental pair-count deltas, `max_token_length`.

The data-parallel TPU variant (corpus shards + `psum` pair-count reduction +
replicated deterministic argmax) lives in `tokenizers_tpu.parallel.bpe_train`;
it reproduces exactly these merges.

Determinism note: with `continuing_subword_prefix`/`end_of_word_suffix` set,
the reference mints the derived alphabet ids (e.g. "##t") in `AHashMap`
iteration order (`trainer.rs:361-365`), which is randomized per process by
ahash's runtime RNG — so the reference itself is nondeterministic whenever a
merge tie-break (count equal, compare pair ids) involves those ids; observed
empirically: three runs, three different merge lists. This implementation
mints them in first-occurrence order of the (insertion-ordered) word-count
dict, making it deterministic; conformance on such configs is therefore
vocab-set equality, not merge-order equality.
"""

from __future__ import annotations

import heapq
from typing import Callable, Dict, Iterable, List, Optional, Set, Tuple

from ..added_vocabulary import AddedToken


class BpeTrainer:
    def __init__(
        self,
        vocab_size: int = 30000,
        min_frequency: int = 0,
        show_progress: bool = True,
        special_tokens: Optional[List] = None,
        limit_alphabet: Optional[int] = None,
        initial_alphabet: Optional[Set[str]] = None,
        continuing_subword_prefix: Optional[str] = None,
        end_of_word_suffix: Optional[str] = None,
        max_token_length: Optional[int] = None,
    ):
        self.vocab_size = vocab_size
        self.min_frequency = min_frequency
        self.show_progress = show_progress
        self.special_tokens = [
            t if isinstance(t, AddedToken) else AddedToken(t, special=True)
            for t in (special_tokens or [])
        ]
        self.limit_alphabet = limit_alphabet
        self.initial_alphabet = set(initial_alphabet or [])
        self.continuing_subword_prefix = continuing_subword_prefix
        self.end_of_word_suffix = end_of_word_suffix
        self.max_token_length = max_token_length
        self.words: Dict[str, int] = {}

    # ------------------------------------------------------------------ feed

    def feed(self, iterator: Iterable[str], process: Callable[[str], List[str]]) -> None:
        """Count words over the corpus — chunked over the fork pool when
        TOKENIZERS_PARALLELISM allows, mirroring the reference's rayon
        map-reduce feed (`models/bpe/trainer.rs:609-638`)."""
        from collections import Counter

        from ..utils.parallelism import maybe_par_map

        seqs = list(iterator)
        words = self.words
        CHUNK = 2000
        if len(seqs) >= 2 * CHUNK:
            chunks = [
                seqs[i : i + CHUNK] for i in range(0, len(seqs), CHUNK)
            ]

            def count(chunk):
                local: Counter = Counter()
                for sequence in chunk:
                    local.update(process(sequence))
                return local

            for local in maybe_par_map(count, chunks, min_items=2):
                for w, c in local.items():
                    words[w] = words.get(w, 0) + c
            return
        local = Counter()
        for sequence in seqs:
            local.update(process(sequence))
        for w, c in local.items():
            words[w] = words.get(w, 0) + c

    # ----------------------------------------------------------------- train

    def train(self, model) -> List[AddedToken]:
        return self.do_train(self.words, model)

    def do_train(self, word_counts: Dict[str, int], model) -> List[AddedToken]:
        word_to_id: Dict[str, int] = {}
        id_to_word: List[str] = []
        max_token_length = (
            self.max_token_length if self.max_token_length is not None else 1 << 62
        )

        # 1. special tokens
        for token in self.special_tokens:
            if token.content not in word_to_id:
                id_to_word.append(token.content)
                word_to_id[token.content] = len(id_to_word) - 1

        # 2. alphabet
        self._compute_alphabet(word_counts, word_to_id, id_to_word)

        # 3. tokenize words
        words, counts = self._tokenize_words(word_counts, word_to_id, id_to_word)

        # 4+5 fast path: the native (C++) merge loop — a port of the Python
        # loop below (the oracle; they are fuzzed identical in
        # tests/test_native_trainer.py).  The reference's trainer hot loop
        # is native too (models/bpe/trainer.rs).  Opt out with
        # TOKENIZERS_TPU_NATIVE_TRAINER=0.
        import os as _os

        if _os.environ.get(
            "TOKENIZERS_TPU_NATIVE_TRAINER", "1"
        ).strip().lower() not in ("0", "false", "no", "off"):
            from ..native import bpe_train_merges

            triples = bpe_train_merges(
                words,
                counts,
                id_to_word,
                self.continuing_subword_prefix,
                self.vocab_size,
                self.min_frequency,
                max_token_length,
            )
            if triples is not None:
                merges: List[Tuple[Tuple[int, int], int]] = []
                for a, b, new_id in triples:
                    part_a = id_to_word[a]
                    part_b = id_to_word[b]
                    if self.continuing_subword_prefix and part_b.startswith(
                        self.continuing_subword_prefix
                    ):
                        part_b = part_b[len(self.continuing_subword_prefix):]
                    new_token = part_a + part_b
                    if new_id == len(id_to_word):
                        id_to_word.append(new_token)
                        word_to_id[new_token] = new_id
                    merges.append(((a, b), new_id))
                return self._finalize_model(
                    model, word_to_id, id_to_word, merges
                )

        # 4. count pairs
        pair_counts: Dict[Tuple[int, int], int] = {}
        where_to_update: Dict[Tuple[int, int], Set[int]] = {}
        for i, (word, _lens) in enumerate(words):
            for a, b in zip(word, word[1:]):
                pair = (a, b)
                pair_counts[pair] = pair_counts.get(pair, 0) + counts[i]
                where_to_update.setdefault(pair, set()).add(i)

        # heap entries: (-count, pair, seq, pos_set)
        heap: List[Tuple[int, Tuple[int, int], int, Set[int]]] = []
        seq = 0
        for pair, pos in where_to_update.items():
            count = pair_counts[pair]
            if count > 0:
                heap.append((-count, pair, seq, pos))
                seq += 1
        where_to_update = {}
        heapq.heapify(heap)

        # 5. merge loop
        from ..utils.progress import progress_bar

        pbar = progress_bar(
            self.show_progress,
            length=max(0, self.vocab_size - len(word_to_id)),
            message="Compute merges",
        )
        merges: List[Tuple[Tuple[int, int], int]] = []
        while True:
            if len(word_to_id) >= self.vocab_size:
                break
            if not heap:
                break
            neg_count, pair, _, pos = heapq.heappop(heap)
            count = -neg_count
            current = pair_counts.get(pair, 0)
            if count != current:
                heapq.heappush(heap, (-current, pair, seq, pos))
                seq += 1
                continue
            if count < 1 or self.min_frequency > count:
                break

            part_a = id_to_word[pair[0]]
            part_b = id_to_word[pair[1]]
            if self.continuing_subword_prefix and part_b.startswith(
                self.continuing_subword_prefix
            ):
                part_b = part_b[len(self.continuing_subword_prefix):]
            new_token = part_a + part_b
            new_token_id = word_to_id.get(new_token, len(id_to_word))
            if new_token not in word_to_id:
                id_to_word.append(new_token)
                word_to_id[new_token] = new_token_id
            merges.append((pair, new_token_id))
            pbar.inc(1)

            # apply merge at all positions, collect pair-count deltas
            for i in sorted(pos):
                ids_i, lens_i = words[i]
                changes = _merge_word_inplace(
                    ids_i, lens_i, pair[0], pair[1], new_token_id, max_token_length
                )
                for (chg_pair, change) in changes:
                    delta = change * counts[i]
                    pair_counts[chg_pair] = pair_counts.get(chg_pair, 0) + delta
                    if change > 0:
                        where_to_update.setdefault(chg_pair, set()).add(i)

            for chg_pair, chg_pos in where_to_update.items():
                c = pair_counts[chg_pair]
                if c > 0:
                    heapq.heappush(heap, (-c, chg_pair, seq, chg_pos))
                    seq += 1
            where_to_update = {}

        pbar.finish()
        return self._finalize_model(model, word_to_id, id_to_word, merges)

    def _finalize_model(self, model, word_to_id, id_to_word, merges):
        model.vocab = dict(word_to_id)
        model.vocab_r = {v: k for k, v in model.vocab.items()}
        model.merges = {
            pair: (i, new_id) for i, (pair, new_id) in enumerate(merges)
        }
        model.merges_list = [
            (id_to_word[p[0]], id_to_word[p[1]]) for p, _ in merges
        ]
        model.continuing_subword_prefix = self.continuing_subword_prefix
        model.end_of_word_suffix = self.end_of_word_suffix
        if model.cache is not None:
            model.cache.clear()
        return list(self.special_tokens)

    # ---------------------------------------------------------------- helpers

    def _compute_alphabet(
        self, wc: Dict[str, int], word_to_id: Dict[str, int], id_to_word: List[str]
    ) -> None:
        alphabet: Dict[str, int] = {}
        for word, count in wc.items():
            for c in word:
                alphabet[c] = alphabet.get(c, 0) + count
        for c in self.initial_alphabet:
            alphabet[c] = 1 << 62

        kept = list(alphabet.items())
        to_remove = (
            max(0, len(alphabet) - self.limit_alphabet)
            if self.limit_alphabet is not None
            else 0
        )
        if to_remove > 0:
            kept.sort(key=lambda kv: kv[1])
            kept = kept[to_remove:]
        kept.sort(key=lambda kv: ord(kv[0]))
        for c, _ in kept:
            if c not in word_to_id:
                id_to_word.append(c)
                word_to_id[c] = len(id_to_word) - 1

    def _tokenize_words(
        self, wc: Dict[str, int], word_to_id: Dict[str, int], id_to_word: List[str]
    ) -> Tuple[List[Tuple[List[int], List[int]]], List[int]]:
        words: List[Tuple[List[int], List[int]]] = []
        counts: List[int] = []
        if not self.continuing_subword_prefix and not self.end_of_word_suffix:
            # fast path (gpt2/byte-level configs): a word's symbols are just
            # its in-alphabet chars — one C-level map per word
            g = word_to_id.get
            for word, count in wc.items():
                counts.append(count)
                current = [i for i in map(g, word) if i is not None]
                words.append((current, [1] * len(current)))
            return words, counts
        for word, count in wc.items():
            current: List[int] = []
            counts.append(count)
            n = len(word)
            for k, c in enumerate(word):
                s = c
                if s in word_to_id:
                    if k != 0 and self.continuing_subword_prefix:
                        s = self.continuing_subword_prefix + s
                    if k == n - 1 and self.end_of_word_suffix:
                        s = s + self.end_of_word_suffix
                    if s not in word_to_id:
                        id_to_word.append(s)
                        word_to_id[s] = len(id_to_word) - 1
                    current.append(word_to_id[s])
            # symbol "lens" are all 1 at start (reference trainer.rs:361:
            # `current_word.add(w2id[..], 1)`); they gate max_token_length.
            words.append((current, [1] * len(current)))
        return words, counts


def _merge_word_inplace(
    word: List[int],
    lens: List[int],
    c1: int,
    c2: int,
    replacement: int,
    max_length: int,
) -> List[Tuple[Tuple[int, int], int]]:
    """Merge all occurrences of (c1, c2) in `word`, returning pair-count deltas.
    `lens` tracks merged symbol char counts, gating pairs that would exceed
    `max_token_length` (reference `models/bpe/word.rs:107-160`)."""
    changes: List[Tuple[Tuple[int, int], int]] = []
    i = 0
    while i < len(word):
        if word[i] == c1 and i + 1 < len(word) and word[i + 1] == c2:
            new_len = lens[i] + lens[i + 1]
            if i > 0:
                changes.append(((word[i - 1], c1), -1))
                if lens[i - 1] + new_len < max_length:
                    changes.append(((word[i - 1], replacement), 1))
            word[i] = replacement
            lens[i] = new_len
            del word[i + 1]
            del lens[i + 1]
            if i < len(word) - 1:
                changes.append(((c2, word[i + 1]), -1))
                if lens[i + 1] + new_len < max_length:
                    changes.append(((replacement, word[i + 1]), 1))
        i += 1
    return changes
