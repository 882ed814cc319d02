"""Multi-host distributed runtime: `jax.distributed` init + mesh config.

The reference is a single-process library whose only runtime knob is the
``TOKENIZERS_PARALLELISM`` env var (`utils/parallelism.rs:15-62`); scaling
past one host does not exist there.  SURVEY.md §2.9 maps that gap to a
first-class mesh/axis config object: this module owns

  * process bootstrap — `initialize()` wraps `jax.distributed.initialize`
    (idempotent; no-ops in single-process runs so library users never need
    to care), after which `jax.devices()` spans every host in the slice;
  * mesh construction — `build_mesh()` returns a 1-D `data` mesh over all
    addressable-or-global chips, or a 2-D (`hosts`, `data`) mesh where the
    outer axis follows DCN (slice/host granularity) and the inner axis ICI,
    via `mesh_utils.create_hybrid_device_mesh`.  Encode is embarrassingly
    data-parallel so collectives never cross the outer axis; the BPE
    trainer's `psum` of pair counts rides ICI within a slice and DCN only
    for the final count reduction — the layout the scaling-book recipe
    prescribes for reduce-heavy, exchange-light programs;
  * a process-global default mesh — `set_default_mesh()` /
    `get_default_mesh()`, also settable declaratively with
    ``TOKENIZERS_TPU_MESH=data`` (1-D over all devices) or
    ``TOKENIZERS_TPU_MESH=hosts,data`` (hybrid).  `Tokenizer` batch APIs
    shard over the default mesh when one is configured, with zero call-site
    changes.

Multi-process execution is tested for real on this image:
tests/test_multihost.py boots TWO CPU processes against a localhost
coordinator (4 virtual devices each), builds the 8-device global mesh
through `build_mesh`, and runs the trainer's `psum` count reduction across
processes.  `__graft_entry__.dryrun_multichip` additionally validates the
full sharded programs on an N-device mesh.
"""

from __future__ import annotations

import os
import threading
from typing import Optional, Sequence

_lock = threading.Lock()
_initialized = False
_default_mesh = None
_env_mesh_tried = False

ENV_MESH = "TOKENIZERS_TPU_MESH"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Bootstrap the multi-host runtime (idempotent).

    With no arguments, relies on the cluster environment autodetection
    baked into `jax.distributed.initialize` (TPU pod metadata, SLURM, ...).
    Returns True when a multi-process runtime was (already) initialized,
    False when running single-process (no coordinator configured — the
    normal library case, never an error)."""
    global _initialized
    with _lock:
        if _initialized:
            return True
        import jax

        explicit = coordinator_address is not None
        auto = any(
            os.environ.get(k)
            for k in (
                "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS",
                "SLURM_JOB_ID",
                "TPU_WORKER_HOSTNAMES",
            )
        )
        if not explicit and not auto:
            return False
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _initialized = True
        return True


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1


def build_mesh(axes: Sequence[str] = ("data",), devices=None):
    """A mesh over the full slice.

    `axes=("data",)`: 1-D over every global device — the encode/training
    default (no cross-device communication for encode; `psum` over ICI+DCN
    for training counts).

    `axes=("hosts", "data")`: 2-D hybrid — outer axis has one slot per
    process/granule connected by DCN, inner axis the ICI-connected chips
    within it.  Shard batch rows over BOTH axes for encode; keep
    replicated state (merge tables) unsharded so it lives once per chip.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    axes = tuple(axes)
    if len(axes) == 1:
        return Mesh(np.asarray(devices), axes)
    if len(axes) == 2:
        n_proc = max(
            len({getattr(d, "process_index", 0) for d in devices}), 1
        )
        if n_proc > 1 and len(devices) % n_proc == 0:
            try:
                from jax.experimental import mesh_utils

                arr = mesh_utils.create_hybrid_device_mesh(
                    (1, len(devices) // n_proc),
                    (n_proc, 1),
                    devices=devices,
                )
                return Mesh(arr, axes)
            except Exception:
                pass
        # single process (or irregular device count): degenerate outer axis
        return Mesh(np.asarray(devices).reshape(1, -1), axes)
    raise ValueError(f"unsupported mesh axes {axes!r}")


def set_default_mesh(mesh) -> None:
    """Install a process-global default mesh; `Tokenizer` batch encodes
    shard over it automatically.  Pass None to clear."""
    global _default_mesh, _env_mesh_tried
    _default_mesh = mesh
    _env_mesh_tried = True  # explicit call beats the env var forever


def get_default_mesh():
    """The configured default mesh, or one built from $TOKENIZERS_TPU_MESH
    on first use, or None."""
    global _default_mesh, _env_mesh_tried
    if _default_mesh is None and not _env_mesh_tried:
        _env_mesh_tried = True
        spec = os.environ.get(ENV_MESH)
        if spec:
            axes = tuple(a.strip() for a in spec.split(",") if a.strip())
            _default_mesh = build_mesh(axes or ("data",))
    return _default_mesh
