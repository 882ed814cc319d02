"""Data-parallel batch encode over a device mesh.

The reference's `encode_batch` scales with rayon threads on one host
(`tokenizer/mod.rs:1278`, `utils/parallelism.rs`); here the packed byte
batch is sharded over the mesh's `data` axis and the engine's compiled
program runs SPMD — no cross-chip communication is needed for encode, so
scaling is embarrassingly parallel over ICI-connected chips and hosts.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_encode_batch_arrays(engine, inputs: List[str], mesh: Mesh):
    """Run the engine's encode program with rows sharded over `mesh`.

    Returns the same (ids, ntok, orig) chunk list as
    `engine.encode_batch_arrays`, with device arrays laid out across the
    mesh (row counts are padded to the mesh size by the packer's
    power-of-two row padding)."""
    from ..ops.packing import pack_batch

    ndev = mesh.devices.size
    shard = NamedSharding(mesh, P("data"))
    byte_strings = [engine._prepare(s) for s in inputs]
    out = []
    for buf, lengths, orig in pack_batch(byte_strings):
        if buf.shape[0] % ndev:
            pad = ndev - buf.shape[0] % ndev
            buf = np.pad(buf, ((0, pad), (0, 0)))
            lengths = np.pad(lengths, (0, pad))
        d_buf = jax.device_put(buf, shard)
        d_len = jax.device_put(lengths, shard)
        ids, ntok, _bad = engine._program(d_buf, d_len)
        out.append((ids, ntok, orig))
    return out


def shard_encode_batch(
    engine, inputs: List[str], mesh: Mesh
) -> List[List[int]]:
    """Mesh-sharded encode returning plain id lists (conformance helper)."""
    results: List[Optional[List[int]]] = [None] * len(inputs)
    for ids, ntok, orig in shard_encode_batch_arrays(engine, inputs, mesh):
        ids = np.asarray(ids)
        ntok = np.asarray(ntok)
        for r, i in enumerate(orig):
            results[i] = ids[r, : ntok[r]].tolist()
    return results
