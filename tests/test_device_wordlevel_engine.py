"""WordLevelEngine conformance vs the reference wheel (VERDICT r1 item 3:
WordLevel must not fall back to the host path)."""

import pytest
import tokenizers as hf

import tokenizers_tpu as tpu

VOCAB = {}
for w in (
    "the quick brown fox jumps over lazy dog hello world don t it's "
    "a b c ! ? . , 序号 123 mixed2case UPPER _under score"
).split():
    VOCAB[w] = len(VOCAB)
VOCAB["<unk>"] = len(VOCAB)

BATCH = [
    "the quick brown fox",
    "hello, world!",
    "don't stop",
    "序号 123 abc",
    "",
    "   ",
    "a  b   c",
    "UPPER lower MixedCase",
    "x" * 200 + " the",
    "it's a dog... or fox?",
    "tab\there and\nnewline",
    "trailing space ",
    "_under score_ _under",
]


def build(Pre, normalizer=None):
    ours = tpu.Tokenizer(tpu.models.WordLevel(VOCAB, unk_token="<unk>"))
    ours.pre_tokenizer = getattr(tpu.pre_tokenizers, Pre)()
    ref = hf.Tokenizer(hf.models.WordLevel(VOCAB, unk_token="<unk>"))
    ref.pre_tokenizer = getattr(hf.pre_tokenizers, Pre)()
    if normalizer:
        ours.normalizer = getattr(tpu.normalizers, normalizer)()
        ref.normalizer = getattr(hf.normalizers, normalizer)()
    return ours, ref


@pytest.mark.parametrize(
    "pre", ["Whitespace", "WhitespaceSplit", "BertPreTokenizer"]
)
def test_conformance(pre):
    ours, ref = build(pre)
    eng = ours._get_device_engine()
    assert eng is not None, "WordLevel pipeline must compile to the device"
    assert type(eng).__name__ == "WordLevelEngine"
    a = [e.ids for e in ours.encode_batch_fast(BATCH)]
    b = [e.ids for e in ref.encode_batch_fast(BATCH, add_special_tokens=True)]
    assert a == b, [(s, x, y) for s, x, y in zip(BATCH, a, b) if x != y]


def test_normalizer_host_prepare():
    ours, ref = build("Whitespace", normalizer="Lowercase")
    assert type(ours._get_device_engine()).__name__ == "WordLevelEngine"
    batch = ["THE QUICK Brown fox", "Hello, WORLD!"]
    a = [e.ids for e in ours.encode_batch_fast(batch)]
    b = [e.ids for e in ref.encode_batch_fast(batch, add_special_tokens=True)]
    assert a == b


def test_added_tokens_route_host():
    ours, ref = build("Whitespace")
    ours.add_special_tokens([tpu.AddedToken("<s>", special=True)])
    ref.add_special_tokens([hf.AddedToken("<s>", special=True)])
    batch = ["<s> the fox", "plain text the"]
    a = [e.ids for e in ours.encode_batch_fast(batch)]
    b = [e.ids for e in ref.encode_batch_fast(batch, add_special_tokens=True)]
    assert a == b


def test_normalized_added_token_surfaces_after_normalization():
    # a lowercase-normalized added token must still route to host when the
    # RAW text doesn't contain it but the normalized text does
    ours, ref = build("Whitespace", normalizer="Lowercase")
    ours.add_tokens([tpu.AddedToken("special", special=False)])
    ref.add_tokens([hf.AddedToken("special", special=False)])
    batch = ["SPECIAL the fox"]
    a = [e.ids for e in ours.encode_batch_fast(batch)]
    b = [e.ids for e in ref.encode_batch_fast(batch, add_special_tokens=True)]
    assert a == b


def test_punct_heavy_row_falls_back():
    # every byte a word (bert punct isolate) can exceed the token buffer;
    # row_bad must hand the row to the host, not truncate
    ours, ref = build("BertPreTokenizer")
    batch = ["!" * 300, "the fox"]
    a = [e.ids for e in ours.encode_batch_fast(batch)]
    b = [e.ids for e in ref.encode_batch_fast(batch, add_special_tokens=True)]
    assert a == b
