"""Device Unigram EM (ops/unigram_em_step.py) pinned against the host
lattice oracle: E-step marginals, per-sentence logZ, Viterbi token counts,
and the pruning Viterbi-frequency pass, plus the mesh-sharded (psum) path.

Reference semantics: `models/unigram/trainer.rs:451-491` (run_e_step),
`:320-357` (Viterbi frequencies), `models/unigram/lattice.rs:331`
(populate_marginal).
"""

import math

import numpy as np
import pytest

from tokenizers_tpu.models.unigram import Unigram
from tokenizers_tpu.models.unigram_lattice import Lattice
from tokenizers_tpu.ops.unigram_em_step import DeviceEm

SENTENCES = [
    ("hello", 5),
    ("world", 3),
    ("hell", 2),
    ("low", 7),
    ("lower", 1),
    ("héllo", 2),  # multi-byte char -> unk node of byte length 2
    ("owo", 4),
    ("wow", 1),
]

PIECES = [
    ("h", -2.0),
    ("e", -2.5),
    ("l", -1.5),
    ("o", -2.2),
    ("w", -3.0),
    ("r", -3.1),
    ("he", -3.3),
    ("ll", -2.9),
    ("lo", -3.6),
    ("low", -4.0),
    ("hello", -6.0),
    ("wo", -3.8),
]


def _host_e_step(model, sentences):
    expected = [0.0] * len(model.vocab)
    z = np.zeros(len(sentences))
    ntok = 0
    for i, (s, n) in enumerate(sentences):
        lat = Lattice(s, model.bos_id, model.eos_id)
        model.populate_nodes(lat)
        z[i] = lat.populate_marginal(float(n), expected)
        ntok += len(lat.viterbi())
    return np.array(expected), z, ntok


def _host_viterbi_freq(model, sentences):
    freq = [0.0] * len(model.vocab)
    for s, n in sentences:
        lat = Lattice(s, model.bos_id, model.eos_id)
        model.populate_nodes(lat)
        for node in lat.viterbi():
            freq[node.id] += float(n)
    return np.array(freq)


@pytest.fixture(scope="module")
def model():
    vocab = [("<unk>", 0.0)] + PIECES
    return Unigram(vocab, unk_id=0)


def test_e_step_matches_host_lattice(model):
    dev = DeviceEm(SENTENCES)
    out = dev.e_step(model)
    assert out is not None
    exp_d, z_d, ntok_d = out
    exp_h, z_h, ntok_h = _host_e_step(model, SENTENCES)
    assert ntok_d == ntok_h
    np.testing.assert_allclose(np.asarray(z_d), z_h, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(exp_d), exp_h, rtol=1e-9, atol=1e-12
    )


def test_viterbi_freq_matches_host_lattice(model):
    dev = DeviceEm(SENTENCES)
    freq_d = dev.viterbi_freq(model)
    assert freq_d is not None
    freq_h = _host_viterbi_freq(model, SENTENCES)
    np.testing.assert_array_equal(np.asarray(freq_d), freq_h)


def test_mesh_sharded_e_step_matches_unsharded(model):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    dev = DeviceEm(SENTENCES, mesh=mesh)
    out = dev.e_step(model)
    assert out is not None
    exp_d, z_d, ntok_d = out
    exp_h, z_h, ntok_h = _host_e_step(model, SENTENCES)
    assert ntok_d == ntok_h
    np.testing.assert_allclose(np.asarray(z_d), z_h, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(exp_d), exp_h, rtol=1e-9, atol=1e-12
    )
    freq_d = dev.viterbi_freq(model)
    np.testing.assert_array_equal(
        np.asarray(freq_d), _host_viterbi_freq(model, SENTENCES)
    )


def test_trained_pieces_device_equals_host():
    """Full EM training with the device path must yield the same final
    pieces as the forced-host path (scores to EM tolerance)."""
    import os

    from tokenizers_tpu.trainers.unigram_trainer import UnigramTrainer

    corpus = (
        "the quick brown fox jumps over the lazy dog "
        "pack my box with five dozen liquor jugs "
        "how vexingly quick daft zebras jump"
    ).split()
    wc = {}
    for w in corpus:
        wc[w] = wc.get(w, 0) + 1

    def train(force_host):
        old = os.environ.get("TOKENIZERS_TPU_DEVICE_EM")
        if force_host:
            os.environ["TOKENIZERS_TPU_DEVICE_EM"] = "0"
        try:
            m = Unigram()
            tr = UnigramTrainer(
                vocab_size=60,
                special_tokens=["<unk>"],
                unk_token="<unk>",
                show_progress=False,
            )
            tr.words = dict(wc)
            tr.train(m)
            return m.vocab
        finally:
            if force_host:
                if old is None:
                    del os.environ["TOKENIZERS_TPU_DEVICE_EM"]
                else:
                    os.environ["TOKENIZERS_TPU_DEVICE_EM"] = old

    v_host = train(True)
    v_dev = train(False)
    assert [p for p, _ in v_host] == [p for p, _ in v_dev]
    for (p, sh), (_, sd) in zip(v_host, v_dev):
        assert math.isclose(sh, sd, rel_tol=1e-7, abs_tol=1e-9), p
