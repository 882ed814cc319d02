"""Unigram/SentencePiece device engine conformance vs the host path.

Covers Nmt filtering/space-mapping, space-run collapse, Metaspace prepend +
word splits, Viterbi with the reference tie rule, unk fallback and fusion."""

import random

import pytest

from tokenizers_tpu.tokenizer import Tokenizer

FIXTURE = "tests/fixtures/unigram/tokenizer.json"


@pytest.fixture(scope="module")
def unigram():
    tok = Tokenizer.from_file(FIXTURE)
    eng = tok._get_device_engine()
    from tokenizers_tpu.ops.unigram_engine import UnigramEngine

    assert isinstance(eng, UnigramEngine)
    return tok, eng


ADVERSARIAL = [
    "",
    " ",
    "Hello world",
    "  double  spaces   collapse ",
    "don't stop believing",
    "séquence numéro ñ",
    "control\x01chars\x0bhere\x7f",
    "​zero​width",
    "▁literal meta chars▁",
    "zzzz qqqq unknownpieces xq",
    "tabs\tbecome\nspaces",
    # ulp-sensitive Viterbi tie: needs serde_json-style score parsing
    "'Ve'll....",
]


def test_device_matches_host_adversarial(unigram):
    tok, eng = unigram
    host = [tok._encode(s, None, True, "none").ids for s in ADVERSARIAL]
    dev = [e.ids for e in eng.encode_batch(list(ADVERSARIAL), True)]
    for s, h, d in zip(ADVERSARIAL, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_device_matches_host_corpus(unigram):
    tok, eng = unigram
    lines = [
        l for l in open("tests/fixtures/corpus.txt").read().split("\n") if l
    ][:60]
    host = [tok._encode(s, None, True, "none").ids for s in lines]
    dev = [e.ids for e in eng.encode_batch(lines, True)]
    assert host == dev


def test_device_matches_host_fuzz(unigram):
    tok, eng = unigram
    random.seed(23)
    pieces = list("ab XY z19'.ñé序\t ") + ["the", "ing", "  ", "​", "▁"]
    cases = [
        "".join(random.choice(pieces) for _ in range(random.randint(0, 25)))
        for _ in range(80)
    ]
    host = [tok._encode(s, None, True, "none").ids for s in cases]
    dev = [e.ids for e in eng.encode_batch(cases, True)]
    for s, h, d in zip(cases, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_char_offsets_match_host(unigram):
    """Device encode_batch with char offsets/tokens/words == host path,
    including space-run collapse spans, unk span text, and fused-unk runs."""
    tok, _ = unigram
    cases = ADVERSARIAL + ["séquence ñ", "zz\x01qq deleted ctrl"]
    host = [tok._encode(s, None, True, "char") for s in cases]
    dev = tok.encode_batch(cases)
    for s, h, d in zip(cases, host, dev):
        assert h.ids == d.ids, s
        assert h.offsets == d.offsets, s
        assert h.tokens == d.tokens, s
        assert h.words == d.words, s
