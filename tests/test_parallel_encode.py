"""Mesh-sharded encode == host pipeline on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tokenizers_tpu.parallel import shard_encode_batch
from tokenizers_tpu.tokenizer import Tokenizer


@pytest.mark.parametrize("ndev", [1, 8])
def test_sharded_encode_matches_host(ndev):
    devs = jax.devices()
    if len(devs) < ndev:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(devs[:ndev]), ("data",))
    tok = Tokenizer.from_file("tests/fixtures/gpt2/tokenizer.json")
    eng = tok._get_device_engine()
    inputs = [f"doc {i}: the quick brown fox says {'ha ' * (i % 7)}" for i in range(20)]
    host = [tok._encode(s, None, True, "none").ids for s in inputs]
    dev = shard_encode_batch(eng, inputs, mesh)
    assert host == dev
