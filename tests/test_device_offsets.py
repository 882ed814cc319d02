"""Device offsets for the CharBPE and WordLevel engines (the reference's
DEFAULT `encode_batch` surface returns char offsets — these engines
previously dropped to host for it).  Byte spans computed on device are
mapped to original-text offsets through NormalizedString alignments
(engine_base "normalized_bytes" space); conformance oracle is the wheel."""

import json

import pytest

jax = pytest.importorskip("jax")

from tokenizers_tpu import Tokenizer  # noqa: E402

BATCH = [
    "Hello world!",
    "the quick brown fox",
    "  spaced  out  ",
    "",
    "zzz unknownwordzz",
    "don't stop, won't stop",
    "Hello WORLD! The Café",
]


def _assert_device_only(tok):
    """Fail the test if the engine host-falls-back for any input."""

    def boom(*a, **k):  # pragma: no cover - assertion helper
        raise AssertionError("host fallback used")

    tok._encode = boom


def _compare(ref, tok, batch):
    eng = tok._get_device_engine()
    assert eng is not None and eng.supports_offsets
    _assert_device_only(tok)
    ours = tok.encode_batch(batch)
    theirs = ref.encode_batch(batch)
    for s, o, t in zip(batch, ours, theirs):
        assert o.ids == t.ids, (s, o.ids, t.ids)
        assert o.offsets == [tuple(x) for x in t.offsets], (
            s, o.offsets, t.offsets,
        )
        assert o.tokens == t.tokens, s
        assert o.word_ids == t.word_ids, s


def test_wordlevel_offsets():
    tokenizers = pytest.importorskip("tokenizers")
    vocab = {
        "[UNK]": 0, "hello": 1, "world": 2, "the": 3, "a": 4, "cafe": 5,
        "!": 6, ",": 7, "quick": 8, "brown": 9, "fox": 10,
    }
    tj = {
        "version": "1.0",
        "truncation": None, "padding": None, "added_tokens": [],
        "normalizer": {"type": "Sequence", "normalizers": [
            {"type": "NFD"}, {"type": "StripAccents"},
            {"type": "Lowercase"}]},
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None, "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab,
                  "unk_token": "[UNK]"},
    }
    js = json.dumps(tj)
    _compare(tokenizers.Tokenizer.from_str(js), Tokenizer.from_str(js),
             BATCH)
    # no-normalizer variant (alignments identity)
    tj["normalizer"] = None
    js = json.dumps(tj)
    _compare(tokenizers.Tokenizer.from_str(js), Tokenizer.from_str(js),
             BATCH)


@pytest.mark.parametrize(
    "metaspace,suffix,lowercase",
    [(False, "</w>", True), (True, "", False)],
)
def test_charbpe_offsets(metaspace, suffix, lowercase):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import models as rm
    from tokenizers import normalizers as rn
    from tokenizers import pre_tokenizers as rp
    from tokenizers import trainers as rt

    corpus = open("tests/fixtures/corpus.txt").read()[:150_000].splitlines()
    ref = tokenizers.Tokenizer(
        rm.BPE(end_of_word_suffix=suffix, unk_token="<unk>")
    )
    ref.pre_tokenizer = rp.Metaspace() if metaspace else rp.Whitespace()
    if lowercase:
        ref.normalizer = rn.Lowercase()
    tr = rt.BpeTrainer(
        vocab_size=400, special_tokens=["<unk>"],
        end_of_word_suffix=suffix, show_progress=False,
    )
    ref.train_from_iterator(corpus, tr)
    tok = Tokenizer.from_str(ref.to_str())
    assert type(tok._get_device_engine()).__name__ == "CharBpeEngine"
    _compare(ref, tok, BATCH)
