"""Multi-process runtime actually executed: 2 CPU processes, localhost
coordinator, 4 virtual devices each -> an 8-device global mesh, driving
the REAL distributed paths (not a toy psum):

  1. the dense BPE trainer (`ops/bpe_train_dense.py`) over the global
     cross-process mesh — merges must equal the single-process host
     trainer bit-for-bit (SURVEY §2.9: `models/bpe/trainer.rs:378-418`
     mapped to psum'd dense counts);
  2. a sharded batch encode through the gpt2 device engine
     (`parallel/encode.py`) — ids must equal the host pipeline's.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
port = sys.argv[2]
repo = sys.argv[3]
sys.path.insert(0, repo)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from tokenizers_tpu.parallel import runtime

ok = runtime.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)
assert ok, "initialize() returned False with an explicit coordinator"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = runtime.build_mesh(("data",))
assert mesh.devices.size == 8

# ---- 1. dense BPE trainer on the cross-process mesh ---------------------
from tokenizers_tpu.models import BPE
from tokenizers_tpu.parallel.bpe_train import DistributedBpeTrainer
from tokenizers_tpu.pre_tokenizers import Whitespace
from tokenizers_tpu.trainers.bpe_trainer import BpeTrainer

text = open(os.path.join(repo, "tests/fixtures/corpus.txt"),
            encoding="utf-8").read()[:40_000]
pt = Whitespace()
words = {}
for line in text.splitlines():
    for w, _ in pt.pre_tokenize_str(line):
        words[w] = words.get(w, 0) + 1

def train(trainer):
    model = BPE()
    trainer.words.update(words)
    trainer.train(model)
    return model

host = train(BpeTrainer(vocab_size=200, show_progress=False))
dist = train(DistributedBpeTrainer(vocab_size=200, show_progress=False,
                                   mesh=mesh))
assert host.merges_list == dist.merges_list, (
    host.merges_list[:5], dist.merges_list[:5])
assert host.vocab == dist.vocab
print(f"proc {proc_id}: dense trainer ok ({len(dist.merges_list)} merges)",
      flush=True)

# ---- 2. sharded encode through the device engine ------------------------
# (shard_encode_batch's np.asarray needs fully-addressable arrays, so
# replicate the global outputs through a jit before fetching)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tokenizers_tpu.parallel.encode import shard_encode_batch_arrays
from tokenizers_tpu.tokenizer import Tokenizer

tok = Tokenizer.from_file(
    os.path.join(repo, "tests/fixtures/gpt2/tokenizer.json"))
eng = tok._get_device_engine()
assert eng is not None
batch = [
    "hello world", "the quick brown fox", "don't stop me now",
    "a b c d e f g", "tokenizers on meshes", "one more line",
    "and another one", "the last one here",
]
repl = NamedSharding(mesh, P())
replicate = jax.jit(lambda x: x, out_shardings=repl)
got = [None] * len(batch)
for ids, ntok, orig in shard_encode_batch_arrays(eng, batch, mesh):
    ids = np.asarray(jax.device_get(replicate(ids)))
    ntok = np.asarray(jax.device_get(replicate(ntok)))
    for r, i in enumerate(orig):
        got[i] = ids[r, : ntok[r]].tolist()
expect = [tok._encode(s, None, True, "none").ids for s in batch]
assert got == expect, (got[0], expect[0])
print(f"proc {proc_id}: sharded encode ok", flush=True)
"""


def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(script),
                str(i),
                str(port),
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "dense trainer ok" in out, out[-3000:]
        assert "sharded encode ok" in out, out[-3000:]
