"""Multi-process runtime actually executed: 2 CPU processes, localhost
coordinator, 4 virtual devices each -> an 8-device global mesh, driving
`runtime.initialize` + the trainer's count-reduction step (`psum` over the
'data' axis) with per-process shards.

This exercises the SURVEY §2.9 distributed path end-to-end: process
bootstrap, global mesh construction across processes, deterministic
cross-process reduction (both processes must compute identical reduced
counts, equal to the host sum of all shards)."""

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
# the persistent compile cache is process-shared; harmless on CPU it's off
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

# the trainer's count-reduction step: per-shard pair counts psum'd over
# the mesh (ops/bpe_train_step.py semantics in miniature)
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

V = 16
# per-process local data: 4 local shards of a [8, V] global count array
rows = np.arange(8 * V, dtype=np.int32).reshape(8, V)
global_counts = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), rows[proc_id * 4 : (proc_id + 1) * 4]
)

def body(c):
    return jax.lax.psum(c, "data")

reduced = jax.jit(
    shard_map(
        body, mesh=mesh, in_specs=P("data"), out_specs=P()
    )
)(global_counts)
local = np.asarray(
    [s.data for s in reduced.addressable_shards][0]
).reshape(-1)
expect = rows.sum(axis=0).astype(np.int32)
np.testing.assert_array_equal(local[:V], expect)

# 2-D hybrid mesh construction across the two processes
mesh2 = runtime.build_mesh(("hosts", "data"))
assert mesh2.devices.shape[0] in (1, 2)

print(f"proc {proc_id}: psum ok, first={int(local[0])}", flush=True)
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
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "psum ok" in out, out[-3000:]
