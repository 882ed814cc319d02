"""Conformance tests for the TPU byte-level BPE engine vs the host path.

The host pipeline is itself conformance-tested against the reference
(`test_conformance_*`), so device == host implies device == reference.
Runs on the virtual CPU backend (see conftest.py).
"""

import random

import numpy as np
import pytest

from tokenizers_tpu.tokenizer import Tokenizer

FIXTURE = "tests/fixtures/gpt2/tokenizer.json"


@pytest.fixture(scope="module")
def gpt2():
    tok = Tokenizer.from_file(FIXTURE)
    eng = tok._get_device_engine()
    assert eng is not None, "gpt2 pipeline must be device-compilable"
    return tok, eng


ADVERSARIAL = [
    "",
    " ",
    "  ",
    "   x",
    "x   ",
    "don't",
    "don'tt",
    "isn't it's 'twas I'll you'd we're I've 'm",
    "'s 't 're 've 'm 'll 'd 'S 'T",
    "''s !!'t a'la 9'9 x'll'd!!'ve",
    "a\tb\t\tc\nd \t e",
    "héllo wörld ñaña",
    "序号123 テスト中です",
    "123abc!!!def456",
    "a  b   c    d",
    "...---...",
    "👍👍🏽 ok  　end",
    "Hello, y'all! How are you 😁 ?",
]


def test_device_matches_host_adversarial(gpt2):
    tok, eng = gpt2
    host = [tok._encode(s, None, True, "none").ids for s in ADVERSARIAL]
    dev = [e.ids for e in eng.encode_batch(list(ADVERSARIAL), True)]
    for s, h, d in zip(ADVERSARIAL, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_device_matches_host_corpus(gpt2):
    tok, eng = gpt2
    lines = [
        l for l in open("tests/fixtures/corpus.txt").read().split("\n") if l
    ][:120]
    host = [tok._encode(s, None, True, "none").ids for s in lines]
    dev = [e.ids for e in eng.encode_batch(lines, True)]
    assert host == dev


def test_device_matches_host_fuzz(gpt2):
    tok, eng = gpt2
    random.seed(7)
    pieces = list("ab XY9'.!ñ序\t") + ["'s", "'ll", "  ", "..."]
    cases = [
        "".join(random.choice(pieces) for _ in range(random.randint(0, 40)))
        for _ in range(120)
    ]
    host = [tok._encode(s, None, True, "none").ids for s in cases]
    dev = [e.ids for e in eng.encode_batch(cases, True)]
    for s, h, d in zip(cases, host, dev):
        assert h == d, f"mismatch on {s!r}"


def test_added_tokens_route_to_host(gpt2):
    tok, eng = gpt2
    cases = ["a<|endoftext|>b", "plain text", "<|endoftext|>"]
    host = [tok._encode(s, None, True, "none").ids for s in cases]
    dev = [e.ids for e in eng.encode_batch(cases, True)]
    assert host == dev


def test_encode_batch_fast_dispatches(gpt2):
    tok, _ = gpt2
    encs = tok.encode_batch_fast(["hello world", "don't stop"])
    assert [e.ids for e in encs] == [
        tok._encode("hello world", None, True, "none").ids,
        tok._encode("don't stop", None, True, "none").ids,
    ]


def test_cuckoo_table_lookup():
    from tokenizers_tpu.ops.merge_table import CuckooMergeTable

    random.seed(3)
    merges = {}
    while len(merges) < 5000:
        merges[(random.randrange(50000), random.randrange(50000))] = (
            len(merges),
            random.randrange(50000),
        )
    t = CuckooMergeTable(merges)
    keys = list(merges)
    a = np.array([k[0] for k in keys], dtype=np.int32)
    b = np.array([k[1] for k in keys], dtype=np.int32)
    r, n = t.lookup_np(a, b)
    assert [tuple(x) for x in zip(r.tolist(), n.tolist())] == list(merges.values())
    # misses
    a2 = np.array([60001, 70002], dtype=np.int32)
    b2 = np.array([60001, 70002], dtype=np.int32)
    r2, _ = t.lookup_np(a2, b2)
    assert (r2 == -1).all()


def test_long_document_sharding(gpt2):
    """Oversized docs split at safe seams and concatenate exactly."""
    tok, eng = gpt2
    base = "the quick brown fox jumps over the lazy dog. " * 20
    long_doc = base * 200  # ~180KB > MAX_L // 2
    host = tok._encode(long_doc, None, True, "none").ids
    dev = eng.encode_batch([long_doc], True)[0].ids
    assert host == dev


def test_split_long_seams():
    from tokenizers_tpu.ops.longdoc import split_long

    data = ("word " * 10000).encode()
    chunks = split_long(data, 1 << 14)
    assert len(chunks) > 1
    assert b"".join(chunks) == data
    for c in chunks[1:]:
        assert c[0:1] == b" "
    # no safe seam -> unchanged
    blob = b"x" * 100000
    assert split_long(blob, 1 << 14) == [blob]


def test_char_offsets_match_host(gpt2):
    """Device encode_batch (char offsets, tokens, words) == host path."""
    tok, _ = gpt2
    cases = ADVERSARIAL + ["séquence ñ 序号", "mixed é" * 5]
    host = [tok._encode(s, None, True, "char") for s in cases]
    dev = tok.encode_batch(cases)
    for s, h, d in zip(cases, host, dev):
        assert h.ids == d.ids, s
        assert h.offsets == d.offsets, s
        assert h.tokens == d.tokens, s
        assert h.words == d.words, s


def test_byte_offsets_match_host(gpt2):
    tok, _ = gpt2
    cases = ADVERSARIAL + ["séquence ñ 序号"]
    host = [tok._encode(s, None, True, "byte") for s in cases]
    dev = tok.encode_batch_byte_offsets(cases)
    for s, h, d in zip(cases, host, dev):
        assert h.ids == d.ids and h.offsets == d.offsets, s
