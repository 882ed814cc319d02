"""Multi-host runtime helpers (parallel/runtime.py): mesh construction,
the process-global default mesh, and default-mesh-sharded batch encode
equality vs the unsharded engine path.  Runs on the 8-device simulated
CPU backend (conftest.py); true multi-process init needs one process per
host and is exercised only by its no-op single-process path here."""

import numpy as np
import pytest

import jax

from tokenizers_tpu.parallel import runtime
from tokenizers_tpu.tokenizer import Tokenizer

GPT2 = "tests/fixtures/gpt2/tokenizer.json"


@pytest.fixture(autouse=True)
def _clear_default_mesh():
    yield
    runtime.set_default_mesh(None)


def test_initialize_single_process_noop(monkeypatch):
    for k in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "SLURM_JOB_ID",
        "TPU_WORKER_HOSTNAMES",
    ):
        monkeypatch.delenv(k, raising=False)
    assert runtime.initialize() is False
    assert not runtime.is_multi_process()


def test_build_mesh_1d():
    mesh = runtime.build_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == len(jax.devices())


def test_build_mesh_2d_single_process():
    mesh = runtime.build_mesh(("hosts", "data"))
    assert mesh.axis_names == ("hosts", "data")
    assert mesh.devices.shape[0] == 1  # degenerate DCN axis in one process
    assert mesh.devices.size == len(jax.devices())


def test_build_mesh_bad_axes():
    with pytest.raises(ValueError):
        runtime.build_mesh(("a", "b", "c"))


def test_env_mesh(monkeypatch):
    monkeypatch.setenv(runtime.ENV_MESH, "hosts,data")
    runtime.set_default_mesh(None)
    runtime._env_mesh_tried = False
    mesh = runtime.get_default_mesh()
    assert mesh is not None and mesh.axis_names == ("hosts", "data")


def test_default_mesh_sharded_encode_matches():
    tok = Tokenizer.from_file(GPT2)
    eng = tok._get_device_engine()
    assert eng is not None
    batch = [
        "Hello world, this is a mesh-sharded batch encode test.",
        "don't stop believing",
        "the quick brown fox jumps over the lazy dog " * 8,
        "",
        "  leading spaces and trailing  ",
        "numbers 12345 and punct!?",
    ] * 3
    base = [e.ids for e in tok.encode_batch_fast(batch)]

    runtime.set_default_mesh(runtime.build_mesh())
    tok2 = Tokenizer.from_file(GPT2)
    sharded = [e.ids for e in tok2.encode_batch_fast(batch)]
    assert sharded == base

    # the device arrays really were laid out across the mesh
    chunks = tok2._get_device_engine().encode_batch_arrays(batch)
    ids0 = chunks[0][0]
    assert len(ids0.sharding.device_set) > 1
