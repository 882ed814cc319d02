"""Native (C++) BPE trainer core == the Python merge loop (the oracle).

The native core (native/bpe_trainer_core.cpp) ports steps 4-5 of
trainers/bpe_trainer.py — pair counting, the (count desc, pair asc) heap
with lazy revalidation, per-site incremental deltas, token reuse by string
identity, max_token_length gating.  The Python loop is itself conformance-
tested against the reference wheel (tests/test_conformance_trainers.py),
so native == Python == reference.
"""

import os
import random

import pytest

from tokenizers_tpu.models import BPE
from tokenizers_tpu.trainers.bpe_trainer import BpeTrainer


def _train(words, native: bool, **kw):
    os.environ["TOKENIZERS_TPU_NATIVE_TRAINER"] = "1" if native else "0"
    try:
        m = BPE()
        BpeTrainer(show_progress=False, **kw).do_train(dict(words), m)
    finally:
        os.environ.pop("TOKENIZERS_TPU_NATIVE_TRAINER", None)
    return m.merges_list, sorted(m.vocab.items())


def _compare(words, **kw):
    n = _train(words, True, **kw)
    p = _train(words, False, **kw)
    assert n == p, (kw, n[0][:10], p[0][:10])


def corpus_words(nbytes=200_000):
    text = open("tests/fixtures/corpus.txt", encoding="utf-8").read()[:nbytes]
    wc = {}
    for w in text.split():
        wc[w] = wc.get(w, 0) + 1
    return wc


def test_native_lib_builds():
    from tokenizers_tpu.native import _build_trainer_lib

    assert _build_trainer_lib() is not None, "g++ toolchain expected in image"


def test_matches_python_on_corpus():
    _compare(corpus_words(), vocab_size=400)


def test_matches_with_prefix_suffix():
    _compare(
        corpus_words(80_000),
        vocab_size=300,
        continuing_subword_prefix="##",
        end_of_word_suffix="</w>",
    )


def test_matches_with_max_token_length_and_min_frequency():
    _compare(
        corpus_words(80_000), vocab_size=300, max_token_length=4,
        min_frequency=3,
    )


def test_matches_with_special_tokens_and_limit_alphabet():
    _compare(
        corpus_words(80_000),
        vocab_size=300,
        special_tokens=["<unk>", "<pad>"],
        limit_alphabet=40,
    )


def test_fuzz_small_vocabularies():
    rng = random.Random(7)
    letters = "abcdefg"
    for trial in range(8):
        wc = {}
        for _ in range(rng.randint(5, 60)):
            w = "".join(
                rng.choice(letters) for _ in range(rng.randint(1, 9))
            )
            wc[w] = wc.get(w, 0) + rng.randint(1, 9)
        _compare(wc, vocab_size=rng.randint(8, 40))


def test_vocab_size_smaller_than_alphabet():
    _compare({"ab": 3, "cd": 2}, vocab_size=2)
