"""Unigram trainer: suffix-array seeding + EM + pruning.

Host-exact mirror of reference `tokenizers/src/models/unigram/trainer.rs`:

  * `make_seed_sentence_pieces` (:196): corpus flattened with '\\0'
    separators; candidate substrings are the suffix tree's internal nodes
    (native C++ SA-IS — see `tokenizers_tpu/native/`), scored freq *
    char_len, single chars always included; ordering (count desc, char
    desc) / (score desc, string desc); truncation at seed_size; log-prob
    normalization.
  * EM loop (:529-611): `n_sub_iterations` x (E-step lattice marginals /
    M-step Bayesianified digamma), pruning by approximate likelihood loss
    with nbest(2) alternatives (:277-432, including the reference's
    `alternatives.len()` quirk in `logsum_alt`), shrinking to
    vocab_size*1.1, then `finalize` (:113) with required chars and unk.

All float math is f64, matching the reference bit-for-bit in the common
case; conformance is asserted against the reference implementation in
tests/test_unigram_trainer.py.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..added_vocabulary import AddedToken
from ..models.unigram_lattice import Lattice
from ..errors import TrainingError

SentencePiece = Tuple[str, float]


def digamma(x: float) -> float:
    result = 0.0
    while x < 7.0:
        result -= 1.0 / x
        x += 1.0
    x -= 0.5
    xx = 1.0 / x
    xx2 = xx * xx
    xx4 = xx2 * xx2
    result += (
        math.log(x)
        + (1.0 / 24.0) * xx2
        - (7.0 / 960.0) * xx4
        + (31.0 / 8064.0) * xx4 * xx2
        - (127.0 / 30720.0) * xx4 * xx4
    )
    return result


def to_log_prob(pieces: List[SentencePiece]) -> List[SentencePiece]:
    total = sum(score for _, score in pieces)
    logsum = math.log(total)
    return [(piece, math.log(score) - logsum) for piece, score in pieces]


def _make_unigram(pieces: List[SentencePiece]):
    from ..models.unigram import Unigram

    return Unigram(pieces, unk_id=0, byte_fallback=False)


class _TrainerOps:
    """The reference trainer's inner operations over (cfg, sentences).

    The two corpus-wide hot loops — E-step marginals and pruning Viterbi
    statistics — run as batched device programs (`ops/unigram_em_step.py`,
    optionally mesh-sharded with psum'd expectations) when the pieces
    admit a device table; the per-sentence host lattice below remains the
    oracle and the fallback.  Set ``TOKENIZERS_TPU_DEVICE_EM=0`` to force
    the host path."""

    def __init__(self, cfg, sentences: List[Tuple[str, int]]):
        self.cfg = cfg
        self.sentences = sentences
        self._dev = None
        self._dev_failed = False

    def _device_em(self):
        import os

        if os.environ.get("TOKENIZERS_TPU_DEVICE_EM", "1") == "0":
            return None
        if self._dev is None and not self._dev_failed:
            try:
                from ..ops.unigram_em_step import DeviceEm

                self._dev = DeviceEm(
                    self.sentences, mesh=getattr(self.cfg, "mesh", None)
                )
            except Exception:
                self._dev_failed = True
        return self._dev

    # ------------------------------------------------------------- seeding

    def is_valid_sentencepiece(self, char_len: int) -> bool:
        return 0 < char_len <= self.cfg.max_piece_length

    def make_seed_sentence_pieces(self) -> List[SentencePiece]:
        from ..native import suffix_substrings

        flat_chars: List[int] = []
        all_chars: Dict[str, int] = {}
        for string, n in self.sentences:
            if not string:
                continue
            flat_chars.extend(ord(c) for c in string)
            flat_chars.append(0)  # sentence boundary '\0'
            for c in string:
                if c != "\0":
                    all_chars[c] = all_chars.get(c, 0) + n

        chars = np.array(flat_chars, dtype=np.int32)
        nodes = suffix_substrings(chars)

        substr_index: List[Tuple[int, Tuple[int, ...]]] = []
        for off, length, freq in nodes:
            if length <= 1:
                continue
            sub = tuple(int(c) for c in chars[off : off + length])
            if 0 in sub:
                continue
            if not self.is_valid_sentencepiece(length):
                continue
            score = freq * length
            substr_index.append((score, sub))

        seed: List[SentencePiece] = []
        sall = sorted(
            ((cnt, c) for c, cnt in all_chars.items()),
            key=lambda x: (x[0], x[1]),
            reverse=True,
        )
        for cnt, c in sall:
            seed.append((c, float(cnt)))
        substr_index.sort(reverse=True)
        for score, sub in substr_index:
            seed.append(("".join(map(chr, sub)), float(score)))
            if len(seed) >= self.cfg.seed_size:
                break
        return to_log_prob(seed)

    def required_chars(self) -> List[str]:
        out = set()
        for s, _ in self.sentences:
            out.update(s)
        out.update(self.cfg.initial_alphabet)
        return sorted(out)

    # ------------------------------------------------------------------ EM

    def run_e_step(self, model) -> Tuple[float, int, List[float]]:
        all_freq = sum(n for _, n in self.sentences)
        dev = self._device_em()
        if dev is not None:
            out = dev.e_step(model)
            if out is not None:
                exp_arr, z, ntokens = out
                if np.isnan(z).any() or np.isnan(exp_arr).any():
                    raise TrainingError(
                        "likelihood is NAN. Input sentence may be too long."
                    )
                objs = -float(z.sum()) / all_freq
                return objs, ntokens, list(exp_arr)
        expected = [0.0] * len(model.vocab)
        objs = 0.0
        ntokens = 0
        for string, freq in self.sentences:
            lattice = Lattice(string, model.bos_id, model.eos_id)
            model.populate_nodes(lattice)
            z = lattice.populate_marginal(float(freq), expected)
            if math.isnan(z):
                raise TrainingError("likelihood is NAN. Input sentence may be too long.")
            ntokens += len(lattice.viterbi())
            objs -= z / all_freq
        return objs, ntokens, expected

    def run_m_step(
        self, pieces: List[SentencePiece], expected: List[float]
    ) -> List[SentencePiece]:
        assert len(pieces) == len(expected)
        new_pieces: List[SentencePiece] = []
        total = 0.0
        threshold = 0.5
        for i, (freq, (piece, _score)) in enumerate(zip(expected, pieces)):
            if i == 0:  # always keep unk
                new_pieces.append((piece, float("nan")))
                continue
            if freq < threshold:
                continue
            new_pieces.append((piece, freq))
            total += freq
        logsum = digamma(total)
        # applied to every entry, including unk's NaN (digamma(NaN) = NaN),
        # exactly like the reference
        return [(p, digamma(c) - logsum) for p, c in new_pieces]

    # -------------------------------------------------------------- pruning

    def prune_sentence_pieces(
        self, model, pieces: List[SentencePiece]
    ) -> List[SentencePiece]:
        cfg = self.cfg
        always_keep = [True] * len(pieces)
        alternatives: List[List[int]] = [[] for _ in pieces]
        bos_id = len(pieces) + 1
        eos_id = len(pieces) + 2

        for pid, (token, _score) in enumerate(pieces):
            if pid == 0:
                always_keep[pid] = False
                continue
            lattice = Lattice(token, bos_id, eos_id)
            model.populate_nodes(lattice)
            nbests = lattice.nbest(2)
            if len(nbests) == 1:
                always_keep[pid] = True
            elif len(nbests[0]) >= 2:
                always_keep[pid] = False
            elif len(nbests[0]) == 1:
                always_keep[pid] = True
                for node in nbests[1]:
                    alternatives[pid].append(node.id)

        dev = self._device_em()
        freq_arr = dev.viterbi_freq(model) if dev is not None else None
        inverted: Optional[List[List[int]]] = None
        if freq_arr is not None:
            vsum = float(sum(count for _, count in self.sentences))
            freq = list(freq_arr)
        else:
            vsum = 0.0
            freq = [0.0] * len(pieces)
            inverted = [[] for _ in pieces]
            for i, (sentence, count) in enumerate(self.sentences):
                lattice = Lattice(sentence, bos_id, eos_id)
                model.populate_nodes(lattice)
                vsum += float(count)
                for node in lattice.viterbi():
                    freq[node.id] += float(count)
                    inverted[node.id].append(i)

        total = sum(freq)
        logsum = math.log(total)
        candidates: List[Tuple[int, float]] = []
        new_pieces: List[SentencePiece] = [pieces[0]]
        for pid, (token, score) in enumerate(pieces):
            if pid == 0:
                continue
            if freq[pid] == 0.0 and not always_keep[pid]:
                continue
            elif not alternatives[pid]:
                new_pieces.append((token, score))
            else:
                # each viterbi occurrence of a piece appends its sentence to
                # `inverted` AND adds the same count to `freq`, so the two
                # sums are identical — the device path uses freq directly
                # (reference `trainer.rs:320-357,380-395`)
                if inverted is None:
                    f = freq[pid]
                else:
                    f = 0.0
                    for n in inverted[pid]:
                        f += float(self.sentences[n][1])
                if f == 0.0 or math.isnan(f):
                    continue
                f /= vsum
                logprob_sp = math.log(freq[pid]) - logsum
                # NB: the reference uses alternatives.len() — the number of
                # PIECES, not of this piece's alternatives (a quirk kept for
                # bit-compatibility, `trainer.rs:402`)
                logsum_alt = math.log(
                    total + freq[pid] * (len(alternatives) - 1)
                )
                logprob_alt = 0.0
                for n in alternatives[pid]:
                    logprob_alt += math.log(freq[n] + freq[pid]) - logsum_alt
                loss = f * (logprob_sp - logprob_alt)
                candidates.append((pid, loss))

        desired = cfg.vocab_size * 11 // 10
        pruned_size = max(desired, int(len(pieces) * cfg.shrinking_factor))
        candidates.sort(key=lambda x: x[1], reverse=True)
        for pid, _loss in candidates:
            if len(new_pieces) == pruned_size:
                break
            new_pieces.append(pieces[pid])
        return new_pieces

    # ------------------------------------------------------------- finalize

    def finalize(self, model, required_chars: List[str]):
        cfg = self.cfg
        min_score_penalty = 0.0
        min_score_penalty_delta = 0.0001

        pieces: List[SentencePiece] = []
        inserted = {"<UNK>"}
        existing = {tok: score for tok, score in model.vocab}
        for c in required_chars:
            if c in existing:
                inserted.add(c)
                pieces.append((c, existing[c]))
            else:
                score = model.min_score + min_score_penalty
                inserted.add(c)
                pieces.append((c, score))
                min_score_penalty += min_score_penalty_delta

        unk_id: Optional[int] = None
        need_add_unk = False
        if cfg.unk_token is not None:
            unk_id = next(
                (
                    i
                    for i, t in enumerate(cfg.special_tokens)
                    if t.content == cfg.unk_token
                ),
                None,
            )
            if unk_id is None:
                unk_id, need_add_unk = 0, True

        vocab_size_without_special = (
            cfg.vocab_size - len(cfg.special_tokens) - 1
            if need_add_unk
            else cfg.vocab_size - len(cfg.special_tokens)
        )
        for token, score in model.vocab:
            if token in inserted:
                continue
            inserted.add(token)
            pieces.append((token, 0.0 if math.isnan(score) else score))
            if len(pieces) == vocab_size_without_special:
                break
        pieces.sort(key=lambda x: x[1], reverse=True)

        special = [(t.content, 0.0) for t in cfg.special_tokens]
        if need_add_unk:
            special.insert(0, (cfg.unk_token, 0.0))

        from ..models.unigram import Unigram

        return Unigram(special + pieces, unk_id=unk_id, byte_fallback=False)


def do_train(cfg, word_counts: Dict[str, int], model) -> List[AddedToken]:
    sentences = list(word_counts.items())
    ops = _TrainerOps(cfg, sentences)

    pieces: List[SentencePiece] = [("<UNK>", float("nan"))]
    pieces.extend(ops.make_seed_sentence_pieces())
    desired_vocab_size = cfg.vocab_size * 11 // 10

    required_chars = ops.required_chars()
    if len(required_chars) > cfg.vocab_size:
        raise TrainingError(
            "The vocabulary is not large enough to contain all chars"
        )

    new_model = _make_unigram(pieces)
    while True:
        for _ in range(cfg.n_sub_iterations):
            _obj, _ntok, expected = ops.run_e_step(new_model)
            pieces = ops.run_m_step(pieces, expected)
            new_model = _make_unigram(pieces)
        if len(pieces) <= desired_vocab_size:
            break
        pieces = ops.prune_sentence_pieces(new_model, pieces)
        new_model = _make_unigram(pieces)

    final = ops.finalize(new_model, required_chars)
    model.__init__(final.vocab, final.unk_id, final.byte_fallback)
    return list(cfg.special_tokens)
