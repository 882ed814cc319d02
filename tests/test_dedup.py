"""Word-dedup fast branch conformance (ops/bpe_dedup.py).

Repetitive batches take the dedup branch (unique words fit the static
buffer); high-entropy batches take the full-width fallback branch via
`lax.cond`. Both must be bit-identical to the host path."""

import random

import pytest

from tokenizers_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def gpt2():
    tok = Tokenizer.from_file("tests/fixtures/gpt2/tokenizer.json")
    return tok, tok._get_device_engine()


@pytest.fixture(scope="module")
def llama3():
    tok = Tokenizer.from_file("tests/fixtures/llama3/tokenizer.json")
    return tok, tok._get_device_engine()


def corpus_lines(n):
    return [
        l for l in open("tests/fixtures/corpus.txt").read().split("\n") if l
    ][:n]


def check(tok, eng, batch):
    host = [tok._encode(s, None, True, "none").ids for s in batch]
    dev = [e.ids for e in eng.encode_batch(list(batch), True)]
    for s, h, d in zip(batch, host, dev):
        assert h == d, f"mismatch on {s[:60]!r}"


def test_repetitive_batch_gpt2(gpt2):
    tok, eng = gpt2
    lines = corpus_lines(20)
    batch = (lines * 5)[:80] + [
        "the the the quick brown fox " * 30,
        "many words repeat repeat words many " * 12,
        "   <img src=\"https://hub/a/b/c.png\"> x",
    ]
    check(tok, eng, batch)


def test_repetitive_batch_llama3_whole_word(llama3):
    """ignore_merges whole-word bypass must work inside the dedup buffer."""
    tok, eng = llama3
    lines = corpus_lines(20)
    batch = (lines * 5)[:80] + ["hello hello hello world " * 20]
    check(tok, eng, batch)


def test_long_words_fall_back(gpt2):
    """Words needing many merge rounds (holes after mid-loop compaction)."""
    tok, eng = gpt2
    batch = [
        "internationalization antidisestablishmentarianism "
        "huggingface tokenizers pneumonoultramicroscopic " * 8
    ] * 6
    check(tok, eng, batch)


def test_high_entropy_takes_full_branch(gpt2):
    tok, eng = gpt2
    random.seed(7)
    batch = [
        "".join(random.choice("abcdefghijklmnop qrstuvwxyz'.1") for _ in range(90))
        for _ in range(25)
    ]
    check(tok, eng, batch)


def test_multibyte_and_edges(gpt2):
    tok, eng = gpt2
    batch = [
        "",
        " ",
        "é é é é é ",
        "naïve café naïve café " * 10,
        "中文 中文 中文",
        "a",
        "  trailing  spaces   " * 5,
    ] * 3
    check(tok, eng, batch)
