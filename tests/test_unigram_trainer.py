"""Unigram trainer conformance vs the reference implementation.

The trained vocab must match piece-for-piece. Scores match to f64 except
for required-chars absent from the EM result: the reference assigns each a
penalty `min_score + k * 1e-4` in AHashSet iteration order — which is
nondeterministic across reference runs — so scores are compared with a
tolerance wider than the total penalty range.
"""

import math

import pytest

try:
    from tokenizers import Tokenizer as RefTok
    from tokenizers import models as rmodels
    from tokenizers import pre_tokenizers as rpre
    from tokenizers import trainers as rtrainers
except ImportError:  # pragma: no cover
    RefTok = None

from tokenizers_tpu.models.unigram import Unigram
from tokenizers_tpu.pre_tokenizers import WhitespaceSplit
from tokenizers_tpu.pretokenized import PreTokenizedString
from tokenizers_tpu.trainers.unigram_trainer import UnigramTrainer


def _word_counts(corpus):
    wc = {}
    pt = WhitespaceSplit()
    for line in corpus:
        p = PreTokenizedString(line)
        pt.pre_tokenize(p)
        for w, _, _ in p.get_splits():
            wc[w] = wc.get(w, 0) + 1
    return wc


@pytest.mark.skipif(RefTok is None, reason="reference wheel not installed")
def test_matches_reference_trainer():
    import json

    corpus = [
        l for l in open("tests/fixtures/corpus.txt").read().split("\n") if l
    ][:250]

    ref = RefTok(rmodels.Unigram())
    ref.pre_tokenizer = rpre.WhitespaceSplit()
    rt = rtrainers.UnigramTrainer(
        vocab_size=100,
        special_tokens=["<unk>"],
        unk_token="<unk>",
        show_progress=False,
    )
    ref.train_from_iterator(corpus, rt)
    ref_vocab = json.loads(ref.to_str())["model"]["vocab"]

    model = Unigram()
    tr = UnigramTrainer(
        vocab_size=100,
        special_tokens=["<unk>"],
        unk_token="<unk>",
        show_progress=False,
    )
    tr.words = _word_counts(corpus)
    tr.train(model)

    assert len(model.vocab) == len(ref_vocab)
    rd = {p: s for p, s in ref_vocab}
    md = {p: s for p, s in model.vocab}
    assert set(rd) == set(md)
    n_penalty = len(ref_vocab)  # penalty range << 0.01 for vocabs this size
    for p in rd:
        assert math.isclose(rd[p], md[p], rel_tol=1e-6, abs_tol=1e-4 * 16), p


def test_trained_model_roundtrips_encoding():
    corpus = ["the quick brown fox", "the lazy dog", "brown fox jumps"] * 20
    model = Unigram()
    tr = UnigramTrainer(
        vocab_size=40, special_tokens=["<unk>"], unk_token="<unk>",
        show_progress=False,
    )
    tr.words = _word_counts(corpus)
    tr.train(model)
    toks = model.tokenize("the brown fox")
    assert toks and all(t.id >= 0 for t in toks)


def test_native_suffix_array_matches_bruteforce():
    import random

    import numpy as np

    from tokenizers_tpu.native import suffix_substrings

    random.seed(5)
    for _ in range(10):
        n = random.randint(2, 50)
        s = [random.randint(97, 99) for _ in range(n)]
        text = "".join(map(chr, s))
        got = {
            text[o : o + l]: c
            for o, l, c in suffix_substrings(np.array(s, np.int32))
        }
        # every enumerated node's count must equal the substring's true count
        for sub, c in got.items():
            true = sum(
                1 for i in range(n - len(sub) + 1) if text[i : i + len(sub)] == sub
            )
            assert c == true, (sub, c, true)
        # and every repeated right-maximal substring must be present
        for i in range(n):
            for j in range(i + 1, n + 1):
                sub = text[i:j]
                cnt = sum(
                    1
                    for k in range(n - len(sub) + 1)
                    if text[k : k + len(sub)] == sub
                )
                if cnt < 2:
                    continue
                exts = {
                    text[k + len(sub)]
                    for k in range(n - len(sub))
                    if text[k : k + len(sub)] == sub
                }
                right_max = len(exts) > 1 or (
                    len(exts) <= 1 and text.endswith(sub) and len(exts) == 1
                )
                if right_max:
                    assert sub in got, sub
