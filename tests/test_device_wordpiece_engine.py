"""WordPiece/BERT device engine conformance vs the host path.

Covers BertNormalizer (clean/CJK-pad/strip-accents/lowercase tables),
BertPreTokenizer splits, longest-match with ## continuations, whole-word
[UNK] on unmatched or overlong words."""

import random

import pytest

from tokenizers_tpu.tokenizer import Tokenizer

FIXTURE = "tests/fixtures/bert/tokenizer.json"


@pytest.fixture(scope="module")
def bert():
    tok = Tokenizer.from_file(FIXTURE)
    eng = tok._get_device_engine()
    from tokenizers_tpu.ops.wordpiece_engine import WordPieceEngine

    assert isinstance(eng, WordPieceEngine)
    return tok, eng


ADVERSARIAL = [
    "",
    " ",
    "Hello, World!",
    "HeLLo hello HELLO",
    "unaffable unwanted running",
    "café naïve résumé ÉLAN",
    "中文分词测试 中A文",
    "İstanbul ß ﬁle",
    "xqzqxjv zzzzzz qqq",  # likely [UNK] material
    "a" * 120,  # > max_input_chars_per_word -> [UNK]
    "punct...!!!x, (a-b)",
    "\x00\x01control\x7fchars",
    "tabs\tand\nnewlines  spaces",
    "[CLS] routed to host [SEP]",
    "digits 12345 mixed99words",
]


def test_device_matches_host_adversarial(bert):
    tok, eng = bert
    host = [tok._encode(s, None, True, "none").ids for s in ADVERSARIAL]
    dev = [e.ids for e in eng.encode_batch(list(ADVERSARIAL), True)]
    for s, h, d in zip(ADVERSARIAL, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_device_matches_host_corpus(bert):
    tok, eng = bert
    lines = [
        l for l in open("tests/fixtures/corpus.txt").read().split("\n") if l
    ][:80]
    host = [tok._encode(s, None, True, "none").ids for s in lines]
    dev = [e.ids for e in eng.encode_batch(lines, True)]
    assert host == dev


def test_device_matches_host_fuzz(bert):
    tok, eng = bert
    random.seed(13)
    pieces = list("ab XY z19'.!ñé序\t中") + ["##", "the", "run", "  ", "...", "ﬁ"]
    cases = [
        "".join(random.choice(pieces) for _ in range(random.randint(0, 25)))
        for _ in range(100)
    ]
    host = [tok._encode(s, None, True, "none").ids for s in cases]
    dev = [e.ids for e in eng.encode_batch(cases, True)]
    for s, h, d in zip(cases, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_cls_sep_template(bert):
    tok, _ = bert
    enc = tok.encode_batch_fast(["hello"])[0]
    cls = tok.token_to_id("[CLS]")
    sep = tok.token_to_id("[SEP]")
    assert enc.ids[0] == cls and enc.ids[-1] == sep


def test_char_offsets_match_host(bert):
    """Device encode_batch with char offsets/tokens/words == host path,
    including normalization expansions (CJK padding, NFD) and [UNK] spans."""
    tok, _ = bert
    cases = ADVERSARIAL + ["中文 mixed École", "ﬁﬂ ligatures"]
    host = [tok._encode(s, None, True, "char") for s in cases]
    dev = tok.encode_batch(cases)
    for s, h, d in zip(cases, host, dev):
        assert h.ids == d.ids, s
        assert h.offsets == d.offsets, s
        assert h.tokens == d.tokens, s
        assert h.words == d.words, s


def test_byte_offsets_match_host(bert):
    tok, _ = bert
    cases = ADVERSARIAL[:10] + ["中文 École naïve"]
    host = [tok._encode(s, None, True, "byte") for s in cases]
    dev = tok.encode_batch_byte_offsets(cases)
    for s, h, d in zip(cases, host, dev):
        assert h.ids == d.ids and h.offsets == d.offsets, s
