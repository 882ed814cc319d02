"""Host-side parallelism control (reference `utils/parallelism.rs:15-246`).

The reference gates its rayon thread fan-out behind the
``TOKENIZERS_PARALLELISM`` env var plus a process-global override, and
tracks whether parallelism was ever used so the Python binding can warn
about fork-after-threads deadlocks (`bindings/python/src/lib.rs:41-58`).

Here the device engines replace rayon for compilable pipelines; this
module parallelizes the *host fallback* path (exotic configs that are not
device-compilable) across processes.  ``fork`` start is used so workers
inherit the tokenizer by COW memory instead of pickling it per task —
the closest Python analogue to rayon's shared-memory work-stealing.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, List, Optional, Sequence, TypeVar

ENV_VARIABLE = "TOKENIZERS_PARALLELISM"

_override: Optional[bool] = None
_used_parallelism = False

T = TypeVar("T")
U = TypeVar("U")


def parse_env_bool(val: Optional[str]) -> Optional[bool]:
    if val is None:
        return None
    v = val.strip().lower()
    # reference accepts the same spellings (parallelism.rs:25-38)
    if v in ("", "off", "false", "f", "no", "n", "0"):
        return False
    return True


def is_parallelism_configured() -> bool:
    """True when either the env var or the override is set
    (reference `has_parallelism_been_set`)."""
    return _override is not None or os.environ.get(ENV_VARIABLE) is not None


def get_parallelism() -> bool:
    """Effective setting: override beats env; default True
    (reference `get_parallelism`, parallelism.rs:41-52)."""
    if _override is not None:
        return _override
    env = parse_env_bool(os.environ.get(ENV_VARIABLE))
    return True if env is None else env


def set_parallelism(value: bool) -> None:
    """Process-global override (reference `set_parallelism`)."""
    global _override
    _override = value


def has_used_parallelism() -> bool:
    return _used_parallelism


# --------------------------------------------------------------------------

_MIN_ITEMS = 8  # below this, process fan-out costs more than it saves


def _cpu_count() -> int:
    try:
        return len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        return os.cpu_count() or 1


_worker_fn: Optional[Callable] = None


def _worker(args):
    i, item = args
    return i, _worker_fn(item)


def maybe_par_map(
    fn: Callable[[T], U], items: Sequence[T], min_items: int = _MIN_ITEMS
) -> List[U]:
    """Map ``fn`` over ``items`` with a forked process pool when parallelism
    is enabled and worthwhile; serial otherwise.  Order-preserving.

    ``fn`` and each result must be picklable; ``fn``'s closed-over state
    (e.g. the tokenizer) is inherited by fork, not pickled.
    """
    global _used_parallelism, _worker_fn
    n = len(items)
    workers = min(_cpu_count(), n)
    if (
        n < min_items
        or workers < 2
        or not get_parallelism()
        or sys.platform == "win32"
        or not hasattr(os, "fork")
    ):
        return [fn(it) for it in items]

    import multiprocessing

    try:
        ctx = multiprocessing.get_context("fork")
    except ValueError:
        return [fn(it) for it in items]

    _used_parallelism = True
    _worker_fn = fn
    try:
        chunk = max(1, n // (workers * 4))
        with ctx.Pool(processes=workers) as pool:
            out: List[U] = [None] * n  # type: ignore[list-item]
            for i, res in pool.imap_unordered(
                _worker, list(enumerate(items)), chunksize=chunk
            ):
                out[i] = res
            return out
    except Exception:
        # fall back serial on any pool failure (fork-unsafe state, etc.)
        return [fn(it) for it in items]
    finally:
        _worker_fn = None
