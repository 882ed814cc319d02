"""Device-resident dense BPE trainer == host trainer, bit-for-bit.

The dense path (`ops/bpe_train_dense.py`) runs every merge inside one
`lax.while_loop` dispatch; these tests pin its merges/vocab to the host
`BpeTrainer` (itself conformance-tested against the reference wheel in
test_conformance_trainers.py) across meshes, prefixes, and max_token_length.
Reference semantics: `tokenizers/src/models/bpe/trainer.rs:420-593`.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tokenizers_tpu.models import BPE
from tokenizers_tpu.parallel.bpe_train import DistributedBpeTrainer
from tokenizers_tpu.pre_tokenizers import Whitespace
from tokenizers_tpu.trainers.bpe_trainer import BpeTrainer

import os

CORPUS_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "corpus.txt")


def _words(nbytes=100_000):
    text = open(CORPUS_PATH, encoding="utf-8").read()[:nbytes]
    pt = Whitespace()
    words = {}
    for line in text.splitlines():
        for w, _ in pt.pre_tokenize_str(line):
            words[w] = words.get(w, 0) + 1
    return words


def _train(trainer, words):
    model = BPE()
    trainer.words.update(words)
    trainer.train(model)
    return model


@pytest.mark.parametrize("ndev", [1, 8])
def test_dense_matches_host(ndev):
    words = _words()
    host = _train(BpeTrainer(vocab_size=300, show_progress=False), words)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("data",))
    dev = _train(
        DistributedBpeTrainer(vocab_size=300, show_progress=False, mesh=mesh),
        words,
    )
    assert host.vocab == dev.vocab
    assert host.merges_list == dev.merges_list


def test_dense_max_token_length():
    words = _words(60_000)
    kw = dict(vocab_size=300, show_progress=False, max_token_length=4)
    host = _train(BpeTrainer(**kw), words)
    dev = _train(DistributedBpeTrainer(**kw), words)
    assert host.merges_list == dev.merges_list
    assert max(len(t) for t in dev.vocab) <= 4


def test_dense_continuing_prefix():
    # wordpiece-style config: derived "##x" alphabet + prefix stripping in
    # minting; vocab-set equality only (see BpeTrainer module docstring on
    # reference nondeterminism for these configs — but host vs dense of THIS
    # repo are both deterministic, so merges must match exactly too)
    words = _words(60_000)
    kw = dict(
        vocab_size=300, show_progress=False, continuing_subword_prefix="##"
    )
    host = _train(BpeTrainer(**kw), words)
    dev = _train(DistributedBpeTrainer(**kw), words)
    assert host.merges_list == dev.merges_list
    assert host.vocab == dev.vocab


def test_dense_min_frequency():
    words = _words(30_000)
    kw = dict(vocab_size=5000, show_progress=False, min_frequency=50)
    host = _train(BpeTrainer(**kw), words)
    dev = _train(DistributedBpeTrainer(**kw), words)
    assert host.merges_list == dev.merges_list
