"""Pallas-fused BPE merge round.

The lax formulation of one safe-set merge round (`bpe_merge2.merge_round`)
lowers to ~400-500 XLA ops (shift-fills, segmented scans, selects), and on
this backend a round costs ~3.5-4.5 ms dominated by fixed per-op overhead
(PERF.md) — ~20 rounds of that dominates the whole encode.  Here the round
is two Pallas kernels with the only irreducibly-random-access op — the
merge-table row gather — left to XLA between them:

    kernel A (VMEM): adjacency fill -> pair (a, b) -> cuckoo slot hashes
    XLA:             r0 = rows0[h0], r1 = rows1[h1]  (row gathers) + select
    kernel B (VMEM): validity, equal-rank runs, parity, head/tail safety,
                     word-min, apply merges, kill right members

Mosaic lowering rules learned by bisection on this backend (see PERF.md):
`jax.lax.associative_scan` does not lower (zero-size slice), and
`jnp.concatenate` on BOOL vectors crashes the compiler — int32 shifts of
any distance are fine.  So every scan is a hand-rolled Hillis-Steele
doubling over static int32 shifts, and every mask that crosses a shift is
carried as int32 0/1.  The arithmetic is identical to the lax path, which
remains the CPU/test oracle — the two are fuzzed bit-equal in
tests/test_merge_pallas.py.

Grid: one program per [RB, C] row block; rows are independent because
words never cross buffer rows (bpe_dedup layout invariant / packed input
rows).  Requires C % 128 == 0; rows are padded up to RB.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_merge2 import INF
from .merge_table import hash_jnp

RB = 8  # rows per program instance (int32 sublane tile)
BIG = np.int32(0x3FFFFFF0)


def supported(shape) -> bool:
    R, C = shape
    return C % 128 == 0 and C >= 256  # rows are padded up to RB


def _shn(x, fill, k):
    if k >= x.shape[1]:
        return jnp.full(x.shape, fill, x.dtype)
    return jnp.concatenate(
        [x[:, k:], jnp.full((x.shape[0], k), fill, x.dtype)], axis=1
    )


def _shp(x, fill, k):
    if k >= x.shape[1]:
        return jnp.full(x.shape, fill, x.dtype)
    return jnp.concatenate(
        [jnp.full((x.shape[0], k), fill, x.dtype), x[:, :-k]], axis=1
    )


def _fill_dir(vals, alive_b, k_steps, shift):
    """fill_next/fill_prev with the found-mask carried as int32 (bool
    concatenate crashes Mosaic).  Bit-identical to bpe_merge2.fill_*."""
    ai = alive_b.astype(jnp.int32)
    fnd = shift(ai, 0, 1)
    zs = [shift(jnp.where(alive_b, v, 0), 0, 1) for v in vals]
    s = 1
    for _ in range(k_steps):
        fnd_s = shift(fnd, 0, s)
        fb = fnd > 0
        zs = [jnp.where(fb, z, shift(z, 0, s)) for z in zs]
        fnd = fnd | fnd_s
        s *= 2
    return zs, fnd > 0


def fill_next_i(vals, alive_b, k_steps):
    return _fill_dir(vals, alive_b, k_steps, _shn)


def fill_prev_i(vals, alive_b, k_steps):
    return _fill_dir(vals, alive_b, k_steps, _shp)


def _seg_min(r, seg_start_b, C):
    """min of r within segments (both directions), Hillis-Steele doubling
    with int32 segment flags."""
    INF32 = jnp.int32(INF)
    seg_start = seg_start_b.astype(jnp.int32)
    seg_end = _shn(seg_start, 1, 1)

    def sweep(f0, shift):
        v, f = r, f0
        d = 1
        while d < C:
            pv = shift(v, INF32, d)
            pf = shift(f, 1, d)  # beyond the row = "segment complete"
            v = jnp.where(f > 0, v, jnp.minimum(pv, v))
            f = f | pf
            d *= 2
        return v

    return jnp.minimum(sweep(seg_start, _shp), sweep(seg_end, _shn))


def _seg_count(add_b, reset_b, C):
    """Inclusive segmented sum of `add`, restarting at `reset`."""
    v = add_b.astype(jnp.int32)
    f = reset_b.astype(jnp.int32)
    d = 1
    while d < C:
        pv = _shp(v, 0, d)
        pf = _shp(f, 1, d)
        v = jnp.where(f > 0, v, pv + v)
        f = f | pf
        d *= 2
    return v


def _fill_last(vals, isset_b, C, reverse=False):
    """Per position: values at the last set position at-or-before it
    (at-or-after when reverse)."""
    shift = _shn if reverse else _shp
    vs = [jnp.where(isset_b, v, 0) for v in vals]
    s = isset_b.astype(jnp.int32)
    d = 1
    while d < C:
        pvs = [shift(v, 0, d) for v in vs]
        ps = shift(s, 0, d)
        sb = s > 0
        vs = [jnp.where(sb, v, pv) for v, pv in zip(vs, pvs)]
        s = s | ps
        d *= 2
    return vs


def _keys_kernel(seed_ref, ids_ref, h0_ref, h1_ref, nid_ref,
                 *, k_steps, mask):
    ids = ids_ref[:]
    seed = seed_ref[0]
    alive = ids >= 0
    (nid,), _ = fill_next_i([ids], alive, k_steps)
    nid_ref[:] = nid
    h0_ref[:] = hash_jnp(ids, nid, seed, mask, 0)
    h1_ref[:] = hash_jnp(ids, nid, seed, mask, 1)


def _apply_keys_kernel(
    seed_ref, ids_ref, own_l_ref, own_r_ref, wid_ref, r_ref, nw_ref,
    ml_ref, mr_ref,
    ids_o, own_l_o, own_r_o, f_o, h0_o, h1_o, nid_o, *, k_steps, mask,
):
    """Apply kernel that ALSO emits the NEXT round's pair keys (r5): one
    fused kernel per round instead of apply + keys — saves a kernel launch
    and an HBM round-trip of the ids/state arrays every round (~27 rounds
    per chunk on the bench corpus).  Arithmetic identical to
    `_apply_kernel` + `_keys_kernel` in sequence."""
    C = ids_ref.shape[1]
    seed = seed_ref[0]
    _apply_kernel(
        ids_ref, own_l_ref, own_r_ref, wid_ref, r_ref, nw_ref, ml_ref,
        mr_ref, ids_o, own_l_o, own_r_o, f_o, k_steps=k_steps,
    )
    ids2 = ids_o[:]
    alive2 = ids2 >= 0
    (nid2,), _ = fill_next_i([ids2], alive2, k_steps)
    nid_o[:] = nid2
    h0_o[:] = hash_jnp(ids2, nid2, seed, mask, 0)
    h1_o[:] = hash_jnp(ids2, nid2, seed, mask, 1)


def _apply_kernel(
    ids_ref, own_l_ref, own_r_ref, wid_ref, r_ref, nw_ref, ml_ref, mr_ref,
    ids_o, own_l_o, own_r_o, f_o, *, k_steps,
):
    C = ids_ref.shape[1]
    ids = ids_ref[:]
    own_l = own_l_ref[:]
    own_r = own_r_ref[:]
    wid = wid_ref[:]
    r_in = r_ref[:]
    new_id = nw_ref[:]
    mcl_new = ml_ref[:]
    mcr_new = mr_ref[:]

    INF32 = jnp.int32(INF)
    alive = ids >= 0
    seg = wid != _shp(wid, -2, 1)
    mcl_own = jnp.where(alive, own_l, INF32)
    mcr_own = jnp.where(alive, own_r, INF32)

    (nid, nwid, nmcr), nfnd = fill_next_i(
        [ids, wid, mcr_own], alive, k_steps
    )
    valid = alive & nfnd & (nwid == wid)
    r = jnp.where(valid, r_in, INF32)
    cand = valid & (r < INF32)

    (nr, nvalid, nnmcr), _ = fill_next_i(
        [r, valid.astype(jnp.int32), nmcr], alive, k_steps
    )
    (pr, pw, pmcl), pfound = fill_prev_i([r, wid, mcl_own], alive, k_steps)
    prev_in_word = pfound & (pw == wid)

    same_run_prev = cand & prev_in_word & (pr == r)
    run_start = cand & ~same_run_prev
    has_next_pair = valid & nfnd & (nvalid == 1)
    same_run_next = cand & has_next_pair & (nr == r)
    tail = cand & ~same_run_next

    head_ok = run_start & (~prev_in_word | ((r < pr) & (r <= pmcl)))
    tail_ok = tail & (r < nr) & (
        ~has_next_pair | (r <= jnp.minimum(nnmcr, jnp.int32(BIG)) + 1)
    )

    q = _seg_count(cand, seg, C)
    hl, q_head = _fill_last([head_ok.astype(jnp.int32), q], run_start, C)
    (tl,) = _fill_last([tail_ok.astype(jnp.int32)], tail, C, reverse=True)
    parity_odd = ((q - q_head) & 1) == 0

    wmin = _seg_min(r, seg, C)
    f = cand & parity_odd & ((r == wmin) | ((hl == 1) & (tl == 1)))

    (pm,), pfnd = fill_prev_i([f.astype(jnp.int32)], alive, k_steps)
    kill = alive & pfnd & (pm == 1)
    ids_o[:] = jnp.where(kill, -1, jnp.where(f, new_id, ids))
    own_l_o[:] = jnp.where(f, mcl_new, own_l)
    own_r_o[:] = jnp.where(f, mcr_new, own_r)
    f_o[:] = f.astype(jnp.int32)


def _pad_rb(x, fill):
    R0, C = x.shape
    if R0 % RB == 0:
        return x
    pad = RB - R0 % RB
    return jnp.concatenate([x, jnp.full((pad, C), fill, x.dtype)], axis=0)


def _select_rows(ids, nid, h0, h1, rows0, rows1):
    """XLA-side merge-table row gathers + hit selects (the only random
    access of a round); shared by the legacy and fused round drivers."""
    r0 = rows0[h0]
    r1 = rows1[h1]
    hit0 = (r0[..., 0] == ids) & (r0[..., 1] == nid)
    hit1 = (r1[..., 0] == ids) & (r1[..., 1] == nid)
    sel = lambda k: jnp.where(hit0, r0[..., k], r1[..., k])  # noqa: E731
    r_in = jnp.where(hit0 | hit1, sel(2), jnp.int32(INF))
    return r_in, sel(3), sel(4), sel(5)


@functools.partial(jax.jit, static_argnames=("k_steps", "interpret"))
def keys_pallas(ids, rows0, seed, k_steps=9, interpret=False):
    """Initial pair keys (h0, h1, next-id) for the fused round driver.
    Rows are padded up to RB; outputs keep the padded row count (the
    driver runs the whole loop at the padded shape)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ids = _pad_rb(ids, -1)
    R, C = ids.shape
    mask = rows0.shape[0] - 1
    grid = (R // RB,)
    blk = pl.BlockSpec((RB, C), lambda i: (i, 0))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    h0, h1, nid = pl.pallas_call(
        functools.partial(_keys_kernel, k_steps=k_steps, mask=mask),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((R, C), jnp.int32)] * 3,
        interpret=interpret,
    )(seed_arr, ids)
    return h0, h1, nid


@functools.partial(jax.jit, static_argnames=("k_steps", "interpret"))
def merge_round_fused(
    ids, own_l, own_r, wid, h0, h1, nid, rows0, rows1, seed, k_steps=9,
    interpret=False,
):
    """One merge round from carried keys: table row-gathers (XLA) + ONE
    kernel that applies the merges AND emits the next round's keys — the
    r5 replacement for the keys-kernel + apply-kernel pair (one launch
    and one HBM state round-trip fewer per round; ~27 rounds/chunk).
    All arrays must already be RB-row-padded (see `keys_pallas`).
    Returns (ids', own_l', own_r', f, h0', h1', nid')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = ids.shape
    mask = rows0.shape[0] - 1
    r_in, new_id, mcl_new, mcr_new = _select_rows(ids, nid, h0, h1, rows0,
                                                  rows1)
    grid = (R // RB,)
    blk = pl.BlockSpec((RB, C), lambda i: (i, 0))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ids2, own_l2, own_r2, f, h0n, h1n, nidn = pl.pallas_call(
        functools.partial(_apply_keys_kernel, k_steps=k_steps, mask=mask),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * 8,
        out_specs=[blk] * 7,
        out_shape=[jax.ShapeDtypeStruct((R, C), jnp.int32)] * 7,
        interpret=interpret,
    )(seed_arr, ids, own_l, own_r, wid, r_in, new_id, mcl_new, mcr_new)
    return ids2, own_l2, own_r2, f > 0, h0n, h1n, nidn


@functools.partial(jax.jit, static_argnames=("k_steps", "interpret"))
def merge_round_pallas(
    ids, own_l, own_r, wid, rows0, rows1, seed, k_steps=9, interpret=False
):
    """Pallas-fused equivalent of `bpe_merge2.merge_round` (seg is derived
    from wid in-kernel).  Returns (ids, own_l, own_r, any_f)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R0, C = ids.shape
    if R0 % RB:
        pad = RB - R0 % RB

        def padr(x, fill):
            return jnp.concatenate(
                [x, jnp.full((pad, C), fill, x.dtype)], axis=0
            )

        ids = padr(ids, -1)
        own_l = padr(own_l, 0)
        own_r = padr(own_r, 0)
        wid = padr(wid, -1)
    R = ids.shape[0]
    mask = rows0.shape[0] - 1
    grid = (R // RB,)
    blk = pl.BlockSpec((RB, C), lambda i: (i, 0))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    h0, h1, nid = pl.pallas_call(
        functools.partial(_keys_kernel, k_steps=k_steps, mask=mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk,
        ],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((R, C), jnp.int32)] * 3,
        interpret=interpret,
    )(seed_arr, ids)

    r0 = rows0[h0]
    r1 = rows1[h1]
    hit0 = (r0[..., 0] == ids) & (r0[..., 1] == nid)
    hit1 = (r1[..., 0] == ids) & (r1[..., 1] == nid)
    sel = lambda k: jnp.where(hit0, r0[..., k], r1[..., k])  # noqa: E731
    r_in = jnp.where(hit0 | hit1, sel(2), jnp.int32(INF))
    new_id = sel(3)
    mcl_new = sel(4)
    mcr_new = sel(5)

    ids2, own_l2, own_r2, f = pl.pallas_call(
        functools.partial(_apply_kernel, k_steps=k_steps),
        grid=grid,
        in_specs=[blk] * 8,
        out_specs=[blk] * 4,
        out_shape=[jax.ShapeDtypeStruct((R, C), jnp.int32)] * 4,
        interpret=interpret,
    )(ids, own_l, own_r, wid, r_in, new_id, mcl_new, mcr_new)
    if R != R0:
        ids2, own_l2, own_r2, f = (
            ids2[:R0], own_l2[:R0], own_r2[:R0], f[:R0]
        )
    return ids2, own_l2, own_r2, f > 0


_backend_ok = None


def _probe_marker():
    import os

    d = os.path.join(os.path.expanduser("~"), ".cache", "tokenizers_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "pallas_ok")


def _probe() -> bool:
    """Compile + run the real merge round at a tiny shape once per machine
    (cached in a marker file).  A Mosaic failure here downgrades every
    engine to the lax path instead of taking the whole program down."""
    import os

    marker = _probe_marker()
    if os.path.exists(marker):
        return open(marker).read().strip() == "1"
    ok = False
    try:
        ids = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, 256), 1) % 3 == 0,
            -1,
            65,
        )
        z = jnp.zeros((8, 256), jnp.int32)
        wid = jnp.cumsum(
            (jax.lax.broadcasted_iota(jnp.int32, (8, 256), 1) % 5 == 0)
            .astype(jnp.int32),
            axis=1,
        )
        rows = jnp.zeros((1 << 10, 8), jnp.int32)
        out = merge_round_pallas(
            ids, z, z, wid, rows, rows, jnp.int32(1), k_steps=4
        )
        jax.block_until_ready(out[0])
        h0, h1, nid = keys_pallas(ids, rows, jnp.int32(1), k_steps=4)
        out2 = merge_round_fused(
            ids, z, z, wid, h0, h1, nid, rows, rows, jnp.int32(1), k_steps=4
        )
        jax.block_until_ready(out2[0])
        ok = True
    except Exception:
        ok = False
    try:
        with open(marker, "w") as f:
            f.write("1" if ok else "0")
    except OSError:
        pass
    return ok


_accel = None


def on_accelerator() -> bool:
    """True off the CPU test backend — gates the pure-XLA program variants
    that trade compile size/structure for device throughput (width-
    scheduled merge phases, packed Unigram, dedup'd WordPiece)."""
    global _accel
    if _accel is None:
        try:
            _accel = jax.default_backend() not in ("cpu",)
        except Exception:
            _accel = False
    return _accel


def use_pallas() -> bool:
    """Pallas rounds only on the real TPU backend; the lax path stays the
    oracle on CPU (tests) and anywhere Mosaic is unavailable.
    ``TOKENIZERS_TPU_PALLAS=0`` forces the lax path; otherwise a one-time
    probe compile decides (cached in ~/.cache/tokenizers_tpu/pallas_ok —
    delete it to re-probe)."""
    global _backend_ok
    if _backend_ok is None:
        import os

        if os.environ.get("TOKENIZERS_TPU_PALLAS", "1") in ("0", "false"):
            _backend_ok = False
        else:
            try:
                _backend_ok = on_accelerator() and _probe()
            except Exception:
                _backend_ok = False
    return _backend_ok
