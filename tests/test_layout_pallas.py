"""The fused layout kernel (ops/layout_pallas.py, interpret mode on CPU)
must be bit-equal to its lax oracles: gpt2 ascii boundaries, next-boundary
positions, and head-delivered word hashes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tokenizers_tpu.ops import layout_pallas  # noqa: E402
from tokenizers_tpu.ops.bpe_dedup import (  # noqa: E402
    H1_MULT,
    H2_MULT,
    word_hash_heads,
)
from tokenizers_tpu.ops.bpe_encode import (  # noqa: E402
    _shift_next,
    gpt2_boundaries,
)
from tokenizers_tpu.tokenizer import Tokenizer  # noqa: E402


def test_fused_layout_matches_lax():
    tok = Tokenizer.from_file("tests/fixtures/gpt2/tokenizer.json")
    eng = tok._get_device_engine()
    cls_table = eng._program_args()["cls_table"]

    rng = np.random.default_rng(0)
    texts = [
        b"Hello world! don't stop y'all'll've 123 ,,  x",
        open("tests/fixtures/corpus.txt", "rb")
        .read()[:1500]
        .decode("utf-8", "ignore")
        .encode("ascii", "ignore"),
        bytes(rng.integers(32, 127, 700, dtype=np.uint8)),
        b"",
        b"    ",
        b"'s's's'll're' 're",
        b"a" * 600,  # word beyond WORD_CAP: hash fill saturates identically
    ]
    L = 2048
    B = len(texts)
    buf = np.zeros((B, L), np.uint8)
    lens = np.zeros((B,), np.int32)
    for i, t in enumerate(texts):
        t = t[:L]
        buf[i, : len(t)] = np.frombuffer(t, np.uint8)
        lens[i] = len(t)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    inb = pos < jnp.asarray(lens)[:, None]
    b = jnp.where(inb, jnp.asarray(buf, jnp.int32), 0)

    bnd_ref, _ = gpt2_boundaries(b, inb, cls_table, ascii_only=True)
    BIGP = jnp.int32(0x7FFFFFFF)
    nbp = jax.lax.cummin(jnp.where(bnd_ref, pos, BIGP), axis=1, reverse=True)
    nxt_ref = _shift_next(nbp, BIGP)
    h1_ref = word_hash_heads(b, bnd_ref, inb, H1_MULT)
    h2_ref = word_hash_heads(b, bnd_ref, inb, H2_MULT)

    bnd_k, nxt_k, h1_k, h2_k = layout_pallas.layout_fused.__wrapped__(
        b, jnp.asarray(lens), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(bnd_ref), np.asarray(bnd_k))
    np.testing.assert_array_equal(np.asarray(nxt_ref), np.asarray(nxt_k))
    heads = np.asarray(bnd_ref)
    np.testing.assert_array_equal(
        np.asarray(h1_ref)[heads], np.asarray(h1_k)[heads]
    )
    np.testing.assert_array_equal(
        np.asarray(h2_ref)[heads], np.asarray(h2_k)[heads]
    )
