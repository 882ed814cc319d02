"""Host-side batch packing: list[str] -> bucketed uint8[B, L] byte tensors.

The device programs are compiled per (B, L) shape; to bound recompiles,
byte-lengths are bucketed to powers of two and each bucket is chunked so
B*L stays near a fixed position budget (also a power of two).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

MIN_L = 64
MAX_L = 1 << 17  # strings longer than this fall back to the host path
import os as _os

POSITION_BUDGET = 1 << 21  # ~2M byte positions per device call (CPU tests)
# TOKENIZERS_TPU_POSITION_BUDGET: experimentation override (r4) — the r2
# 8M-position experiment measured +24% throughput but OOM'd the remote
# compile helper; the r4 slimmer programs may change that tradeoff.
ACCEL_POSITION_BUDGET = int(
    _os.environ.get("TOKENIZERS_TPU_POSITION_BUDGET", 1 << 21)
)  # r3: measured element-PASS-bound, not
# fixed-overhead-bound — 4x positions bought only ~24% (21->26 MB/s, r2)
# while the XLA compile grew superlinearly until the remote compile
# helper was OOM-killed at 8M positions (the real cause of BENCH_r02's
# rc=124: the HTTP 500 then poisoned the pallas probe marker and the lax
# retry never finished).  2M-position programs compile in ~4-9 min each
# and are cached persistently (tokenizers_tpu/ops/__init__.py).


def _position_budget() -> int:
    from .merge_pallas import on_accelerator

    return ACCEL_POSITION_BUDGET if on_accelerator() else POSITION_BUDGET


def bucket_length(n: int) -> int:
    L = MIN_L
    while L < n:
        L <<= 1
    return L


def _pow2_rows(n: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return b


def pack_batch(
    byte_strings: Sequence[bytes],
) -> List[Tuple[np.ndarray, np.ndarray, List[int]]]:
    """Group byte strings into (bytes u8[B,L], lengths i32[B], orig_indices)
    chunks.  Every input is returned — `bucket_length` keeps doubling past
    MAX_L, so callers wanting the MAX_L bound must pre-split or reject
    oversized strings themselves (see DeviceEngineBase.encode_batch)."""
    buckets = {}
    for i, s in enumerate(byte_strings):
        L = bucket_length(len(s))
        # secondary key: docs whose longest space-free run is short finish
        # their merge loop in few rounds; grouping them separately keeps one
        # long-word doc from holding a whole chunk's while-loop hostage.
        # (space-free run length upper-bounds pre-split word length.)
        longword = max((len(p) for p in s.split(b" ")), default=0) > 40
        # tertiary key: pure-ASCII docs grouped apart from the rest, so a
        # handful of non-ASCII docs can't disqualify whole chunks from the
        # ASCII fast paths (expand=1 BPE grids, dedup'd WordPiece)
        is_ascii = s.isascii()
        buckets.setdefault((L, longword, is_ascii), []).append(i)

    out = []
    budget = _position_budget()
    # the ASCII tertiary split costs one extra partial-(B, L) compile
    # variant per bucket pair; full ASCII chunks keep their fast path, but
    # the ASCII *remainder* rides with the non-ASCII stream (which pays
    # the generic path anyway) so mixed workloads mint at most one partial
    # shape per (L, longword) instead of two
    merged = {}
    for (L, lw, is_ascii), idxs in buckets.items():
        rpc = max(1, budget // L)
        if is_ascii and (L, lw, False) in buckets:
            full = len(idxs) // rpc * rpc
            if full:
                merged.setdefault((L, lw, True), []).extend(idxs[:full])
            merged.setdefault((L, lw, False), []).extend(idxs[full:])
        else:
            merged.setdefault((L, lw, is_ascii), []).extend(idxs)
    for key in merged:
        merged[key].sort()
    for (L, _lw, _ascii), idxs in sorted(merged.items()):
        rows_per_chunk = max(1, budget // L)
        for c in range(0, len(idxs), rows_per_chunk):
            chunk = idxs[c : c + rows_per_chunk]
            B = _pow2_rows(len(chunk))
            # vectorized fill: one C-level join + fancy-index scatter
            flat = np.frombuffer(
                b"".join(byte_strings[i] for i in chunk), dtype=np.uint8
            )
            lens = np.array(
                [len(byte_strings[i]) for i in chunk], dtype=np.int32
            )
            buf = np.zeros((B, L), dtype=np.uint8)
            lengths = np.zeros((B,), dtype=np.int32)
            lengths[: len(chunk)] = lens
            starts = np.concatenate(
                [[0], np.cumsum(lens[:-1], dtype=np.int64)]
            ) if len(chunk) else np.zeros(0, np.int64)
            rows = np.repeat(
                np.arange(len(chunk), dtype=np.int64), lens.astype(np.int64)
            )
            cols = np.arange(flat.size, dtype=np.int64) - np.repeat(
                starts, lens.astype(np.int64)
            )
            buf[rows, cols] = flat
            out.append((buf, lengths, chunk))
    return out
