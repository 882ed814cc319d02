"""DistributedBpeTrainer == host BpeTrainer (== reference trainer) on a
virtual 8-device CPU mesh: psum-reduced sharded counting must reproduce the
host merge sequence bit-for-bit, including tie-breaks.

All cases share one corpus and vocab_size so the SPMD round program compiles
once (shapes keyed by p_cap/v_cap/W/K); config differences (special tokens,
min_frequency, prefix/suffix, max_token_length) are host-side or traced.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tokenizers_tpu.models.bpe import BPE
from tokenizers_tpu.parallel import DistributedBpeTrainer
from tokenizers_tpu.trainers.bpe_trainer import BpeTrainer

CORPUS = (
    "low lower lowest newer newest wider wide widest "
    "the quick brown fox jumps over the lazy dog "
    "aaaa aaaaa bbbb abab ababab don't isn't can't "
    "hugging face tokenizers tokens tokenize tokenized"
).split()

VOCAB_SIZE = 78  # ~15 merges: keeps per-round dispatch cost bounded on CPU


def _word_counts():
    wc = {}
    for w in CORPUS:
        wc[w] = wc.get(w, 0) + 1
    for i, w in enumerate(list(wc)):  # skew counts to exercise tie-breaks
        wc[w] += i % 3
    return wc


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (see conftest.py)")
    return Mesh(np.array(devs[:8]), ("data",))


def _compare(mesh, **kw):
    kw.setdefault("vocab_size", VOCAB_SIZE)
    kw.setdefault("show_progress", False)
    host = BPE()
    BpeTrainer(**kw).do_train(_word_counts(), host)
    dev = BPE()
    DistributedBpeTrainer(mesh=mesh, **kw).do_train(_word_counts(), dev)
    assert dev.merges_list == host.merges_list
    assert dev.vocab == host.vocab


def test_matches_host_trainer(mesh):
    _compare(mesh)


def test_matches_with_special_tokens_and_min_frequency(mesh):
    _compare(mesh, min_frequency=2, special_tokens=["<unk>", "<pad>"])


def test_matches_with_max_token_length(mesh):
    _compare(mesh, max_token_length=3)


def test_matches_with_prefix_suffix(mesh):
    _compare(
        mesh, continuing_subword_prefix="##", end_of_word_suffix="</w>"
    )
