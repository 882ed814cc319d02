"""Char-level BPE device engine conformance (ops/charbpe_engine.py).

The VERDICT r1 long-tail configs — Whitespace+BPE, SentencePiece BPE
(Metaspace), CharBPE (end_of_word_suffix), byte_fallback — must run on the
device engine (no silent host fallback) and match the reference wheel
bit-for-bit.  Tokenizers are trained in-process with the wheel (the
suffix-BPE trainer is nondeterministic across processes, so committed
fixtures would not pin it; in-process both sides load the same
serialization)."""

import pytest
import tokenizers as hf

from tokenizers_tpu.tokenizer import Tokenizer

BATCH = [
    "",
    " ",
    "Hello world!",
    "the quick brown fox jumps over the lazy dog",
    "  doubled  spaces  and\ttabs\nnewlines ",
    "don't you're can't",
    "café résumé naïve söße",
    "序号123 and 日本語テキスト",
    "▁literal metaspace char",
    "punctuation, (lots) of; it!?",
    "zzzzqqqq xjwv unknowable-chars ☃☄",
    "the the the quick " * 30,
    "x" * 600,  # word over WORD_CAP -> row host fallback
]


def corpus_lines(n=4000):
    return [
        l
        for l in open("tests/fixtures/corpus.txt", encoding="utf-8")
        .read()
        .split("\n")
        if l
    ][:n]


def _train(model_kwargs, pre_tok, normalizer=None, vocab_size=600,
           special_tokens=("<unk>",)):
    rtok = hf.Tokenizer(hf.models.BPE(**model_kwargs))
    if normalizer is not None:
        rtok.normalizer = normalizer
    rtok.pre_tokenizer = pre_tok
    tkw = dict(
        vocab_size=vocab_size,
        special_tokens=list(special_tokens),
        show_progress=False,
    )
    if model_kwargs.get("end_of_word_suffix"):
        tkw["end_of_word_suffix"] = model_kwargs["end_of_word_suffix"]
    if model_kwargs.get("continuing_subword_prefix"):
        tkw["continuing_subword_prefix"] = model_kwargs[
            "continuing_subword_prefix"
        ]
    trainer = hf.trainers.BpeTrainer(**tkw)
    rtok.train_from_iterator(corpus_lines(), trainer)
    blob = rtok.to_str()
    ours = Tokenizer.from_str(blob)
    theirs = hf.Tokenizer.from_str(blob)
    return ours, theirs


def check(ours, theirs, batch=BATCH, expect_engine=True):
    eng = ours._get_device_engine()
    if expect_engine:
        from tokenizers_tpu.ops.charbpe_engine import CharBpeEngine

        assert isinstance(eng, CharBpeEngine), type(eng)
    got = [e.ids for e in ours.encode_batch_fast(list(batch))]
    want = [e.ids for e in theirs.encode_batch_fast(list(batch))]
    for s, g, w in zip(batch, got, want):
        assert g == w, (s[:60], g[:20], w[:20])


@pytest.fixture(scope="module")
def ws_bpe():
    return _train({"unk_token": "<unk>"}, hf.pre_tokenizers.Whitespace())


@pytest.fixture(scope="module")
def sp_bpe():
    """SentencePieceBPETokenizer shape: NFKC + Metaspace + fuse_unk."""
    return _train(
        {"unk_token": "<unk>", "fuse_unk": True},
        hf.pre_tokenizers.Metaspace(),
        normalizer=hf.normalizers.NFKC(),
    )


@pytest.fixture(scope="module")
def char_bpe():
    """CharBPETokenizer shape: BertNormalizer + BertPreTokenizer +
    end_of_word_suffix."""
    return _train(
        {"unk_token": "<unk>", "end_of_word_suffix": "</w>"},
        hf.pre_tokenizers.BertPreTokenizer(),
        normalizer=hf.normalizers.BertNormalizer(lowercase=False),
    )


def test_whitespace_bpe(ws_bpe):
    check(*ws_bpe)


def test_whitespace_split_bpe():
    check(*_train({"unk_token": "<unk>"}, hf.pre_tokenizers.WhitespaceSplit()))


def test_sentencepiece_bpe(sp_bpe):
    check(*sp_bpe)


def test_char_bpe_suffix(char_bpe):
    check(*char_bpe)


def test_no_unk_drops_chars(ws_bpe):
    """Without unk_token, unknown chars are silently dropped
    (model.rs:434-436 None arm)."""
    ours, theirs = _train({}, hf.pre_tokenizers.Whitespace(),
                          special_tokens=())
    check(ours, theirs)


def test_byte_fallback():
    """Unknown chars emit <0xXX> ids when all bytes exist
    (model.rs:419-433)."""
    ours, theirs = _train({"unk_token": "<unk>"},
                          hf.pre_tokenizers.Whitespace())
    blob = theirs.to_str()
    import json

    d = json.loads(blob)
    vocab = d["model"]["vocab"]
    base = max(vocab.values()) + 1
    for bb in range(256):
        vocab.setdefault(f"<0x{bb:02X}>", base + bb)
    d["model"]["byte_fallback"] = True
    blob = json.dumps(d)
    check(Tokenizer.from_str(blob), hf.Tokenizer.from_str(blob))


def test_continuing_prefix():
    ours, theirs = _train(
        {"unk_token": "<unk>", "continuing_subword_prefix": "##"},
        hf.pre_tokenizers.Whitespace(),
    )
    check(ours, theirs)


def test_corpus_batch(sp_bpe):
    check(*sp_bpe, batch=corpus_lines(300))


def test_repetitive_and_long(ws_bpe):
    lines = corpus_lines(50)
    check(*ws_bpe, batch=(lines * 3) + ["many words repeat " * 40])
