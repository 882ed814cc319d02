"""Llama-3 device engine conformance vs the host path.

Covers the llama-3-specific semantics: Split(llama pattern)+ByteLevel
pipeline, case-insensitive contractions (incl. U+017F folding to 's'),
digit-triple splitting, punct-run newline suffixes, whitespace/newline run
segmentation, and the BPE `ignore_merges` whole-word bypass."""

import random

import pytest

from tokenizers_tpu.tokenizer import Tokenizer

FIXTURE = "tests/fixtures/llama3/tokenizer.json"


@pytest.fixture(scope="module")
def llama3():
    tok = Tokenizer.from_file(FIXTURE)
    eng = tok._get_device_engine()
    assert eng is not None and eng.boundary == "llama3" and eng.whole_word
    return tok, eng


ADVERSARIAL = [
    "",
    " ",
    "Hello world!",
    "don't DON'T Don'T don'ſ it'ſ",
    "'s 'S 'T 'Re 'VE 'll 'LL 'd",
    "1234567 89 ０１２３４５６７８９",
    "a1b22c333d4444",
    "!!\n\nok",
    "x\r\ny \n\n z",
    " \n \n  tail   ",
    "!?!abc x!y !z",
    "a'la plume",
    "序号123 テスト中です",
    "  spaced  out  ",
    "\t\tab\tcd",
    "<|begin_of_text|>routed to host",
]


def test_device_matches_host_adversarial(llama3):
    tok, eng = llama3
    host = [tok._encode(s, None, True, "none").ids for s in ADVERSARIAL]
    dev = [e.ids for e in eng.encode_batch(list(ADVERSARIAL), True)]
    for s, h, d in zip(ADVERSARIAL, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_device_matches_host_fuzz(llama3):
    tok, eng = llama3
    random.seed(11)
    pieces = list("ab XY z19'.!ñ序\t\n\r") + [
        "'s",
        "'Ve",
        "  ",
        "...",
        "don't",
        "123456",
        "ſ",
        "\r\n",
        "!!\n",
    ]
    cases = [
        "".join(random.choice(pieces) for _ in range(random.randint(0, 30)))
        for _ in range(100)
    ]
    host = [tok._encode(s, None, True, "none").ids for s in cases]
    dev = [e.ids for e in eng.encode_batch(cases, True)]
    for s, h, d in zip(cases, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_template_processing_applies(llama3):
    tok, _ = llama3
    with_special = tok.encode_batch_fast(["hi"])[0].ids
    without = tok.encode_batch_fast(["hi"], add_special_tokens=False)[0].ids
    bos = tok.token_to_id("<|begin_of_text|>")
    assert with_special[0] == bos
    assert with_special[1:] == without


def test_char_offsets_match_host(llama3):
    tok, _ = llama3
    cases = ADVERSARIAL[:12] + ["séquence ñ 序号123"]
    host = [tok._encode(s, None, True, "char") for s in cases]
    dev = tok.encode_batch(cases)
    for s, h, d in zip(cases, host, dev):
        assert h.ids == d.ids, s
        assert h.offsets == d.offsets, s
        assert h.words == d.words, s
