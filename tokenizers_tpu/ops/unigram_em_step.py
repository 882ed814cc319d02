"""Device Unigram EM: lattice forward-backward marginals + Viterbi stats
as batched `lax.scan` programs over packed sentence bytes.

Replaces the two per-sentence hot loops of the reference Unigram trainer
(`tokenizers/src/models/unigram/trainer.rs:451-491` `run_e_step`,
`:320-357` Viterbi frequency counting inside `prune_sentence_pieces`) —
which the reference parallelizes with rayon chunks — with single device
programs over uint8[S, L] packed sentences:

  * node matching: every (char-start, piece-length) pair is probed against
    a 2-way cuckoo rolling-hash table of the current pieces (the same
    structure the serving engine uses, `unigram_encode.py` stage 2), plus
    the reference's unk node when no piece of exactly the char's byte
    length matches (`models/unigram/model.rs:160-199` `populate_nodes`);
  * forward/backward: `lax.scan` over byte boundaries with a K-wide
    alpha/beta window, folding candidates in the HOST lattice's exact
    node order (end nodes: begin-pos increasing = length decreasing;
    begin nodes: length increasing) with the reference's `log_sum_exp`
    (50.0 cutoff, first-node init — `unigram/lattice.rs:123`);
  * marginals: freq * exp(alpha + score + beta - Z) scatter-added into the
    expected-count vector (`lattice.rs:331` `populate_marginal`);
  * Viterbi: same window scan with the first-writer strictly-greater tie
    rule (`lattice.rs:176`), carrying the token count (for `run_e_step`'s
    ntokens) and the chosen (length, id) per boundary (for the pruning
    frequency pass — a gather-free shift backtrack recovers the path).

All score math is float64 (callers wrap in `jax.enable_x64()`), matching
the reference's f64 lattices; exp/log ULP differences vs host libm make
the expected counts equal to ~1e-12 relative rather than bit-identical —
the same tolerance class as the reference's own nondeterministic rayon
reduction order.  `tests/test_device_unigram_em.py` pins device EM ==
host EM on the fixture corpus (final pieces identical).

Output shapes are padded (`n_pieces` -> V_PAD, piece byte length -> K
rounded up) so the compiled programs are reused across EM iterations as
the vocabulary shrinks.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_merge2 import _shift_next, _shift_prev
from .merge_table import CuckooMergeTable, hash_jnp
from .wordpiece_encode import H1_MULT, H2_MULT, _decode_chars

NEG = -1e30


# --------------------------------------------------------------------------
# piece table (host-built per EM iteration; vectorized rolling hashes)
# --------------------------------------------------------------------------


class PieceTable:
    """Cuckoo table of the current pieces: (h1, h2) -> (byte_len, id) with
    slot-aligned f64 scores.  `build` returns None on a true 64-bit hash
    collision between distinct piece strings (host-lattice fallback)."""

    def __init__(self, vtab, scores, max_len, n_pieces):
        self.vtab = vtab
        self.scores = scores
        self.max_len = max_len
        self.n_pieces = n_pieces

    @staticmethod
    def build(
        pieces: List[Tuple[str, float]], max_byte_len: int = 64
    ) -> Optional["PieceTable"]:
        enc = [p.encode("utf-8") for p, _ in pieces]
        max_len = max((len(b) for b in enc), default=1)
        if max_len > max_byte_len:
            return None
        n = len(pieces)
        mat = np.zeros((n, max_len), np.uint32)
        lens = np.zeros(n, np.int64)
        for i, bs in enumerate(enc):
            lens[i] = len(bs)
            mat[i, : len(bs)] = np.frombuffer(bs, np.uint8)
        h1 = np.zeros(n, np.uint32)
        h2 = np.zeros(n, np.uint32)
        with np.errstate(over="ignore"):
            for j in range(max_len):
                live = j < lens
                h1 = np.where(live, h1 * np.uint32(H1_MULT) + mat[:, j] + 1, h1)
                h2 = np.where(live, h2 * np.uint32(H2_MULT) + mat[:, j] + 1, h2)
        k1 = h1.astype(np.int32)
        k2 = h2.astype(np.int32)

        entries = {}
        key_bytes = {}
        for i, (bs, score) in enumerate(zip(enc, (s for _, s in pieces))):
            if not bs:
                continue
            key = (int(k1[i]), int(k2[i]))
            if key in entries and key_bytes[key] != bs:
                return None  # true collision: device table can't disambiguate
            # duplicate strings keep the LAST occurrence (host dict does too)
            entries[key] = (len(bs), i, float(score))
            key_bytes[key] = bs

        vtab = CuckooMergeTable({k: (l, i) for k, (l, i, _s) in entries.items()})
        scores = np.zeros((2, vtab.size), np.float64)
        from .merge_table import _hash

        for (a, b), (_l, _i, sc) in entries.items():
            for t in (0, 1):
                h = int(_hash(np.array([a]), np.array([b]), vtab.seed, vtab.size - 1, t)[0])
                if vtab.key_a[t][h] == a and vtab.key_b[t][h] == b:
                    scores[t][h] = sc
                    break
        # round K up so the jitted programs survive vocab shrinkage
        k_pad = -(-max_len // 4) * 4
        return PieceTable(vtab, scores, k_pad, n)

    def device_args(self):
        vtab = self.vtab
        p1 = np.ones(self.max_len + 1, np.uint32)
        p2 = np.ones(self.max_len + 1, np.uint32)
        with np.errstate(over="ignore"):
            for i in range(1, self.max_len + 1):
                p1[i] = p1[i - 1] * H1_MULT
                p2[i] = p2[i - 1] * H2_MULT
        return dict(
            vkey_a=jnp.asarray(vtab.key_a),
            vkey_b=jnp.asarray(vtab.key_b),
            vlen=jnp.asarray(vtab.rank),
            vid=jnp.asarray(vtab.new_id),
            vscore=jnp.asarray(self.scores),
            vseed=int(vtab.seed),
            pow1=jnp.asarray(p1),
            pow2=jnp.asarray(p2),
        )


# --------------------------------------------------------------------------
# shared node grid
# --------------------------------------------------------------------------


def _piece_nodes(
    b,
    inb,
    lengths,
    vkey_a,
    vkey_b,
    vlen,
    vid,
    vscore,
    vseed,
    pow1,
    pow2,
    unk_id,
    unk_score,
    max_len,
):
    """-> (cost f64[S, L, K], pid int32[S, L, K]): lattice node grid.
    Entry (s, p, l-1) is the piece beginning at byte p with byte length l
    (pid -1 = no node).  Mirrors `populate_nodes`: vocab hits at char
    starts, plus an unk node of exactly the char's byte length when no
    vocab piece of that length matches."""
    S, L = b.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    _, is_start, charlen = _decode_chars(b, inb)

    def prefix_hash(mult):
        def op(x, y):
            (a1, c1), (a2, c2) = x, y
            return a1 * a2, c1 * a2 + c2

        a0 = jnp.full((S, L), mult)
        c0 = (b + 1).astype(jnp.uint32)
        _, hh = jax.lax.associative_scan(op, (a0, c0), axis=1)
        # padded so substring hashes are STATIC slices (take_along_axis
        # costs per index on this backend)
        return jnp.concatenate(
            [jnp.zeros((S, 1), jnp.uint32), hh,
             jnp.zeros((S, max_len), jnp.uint32)],
            axis=1,
        )

    E1 = prefix_hash(H1_MULT)
    E2 = prefix_hash(H2_MULT)
    E1_base = E1[:, :L]
    E2_base = E2[:, :L]

    vmask = vkey_a.shape[1] - 1
    s_ok = inb & is_start
    sdtype = vscore.dtype
    NEGS = jnp.asarray(NEG, sdtype)
    costs = []
    pids = []
    for l in range(1, max_len + 1):
        e = pos + l
        valid = s_ok & (e <= lengths[:, None])
        h1 = (E1[:, l : l + L] - E1_base * pow1[l]).astype(jnp.int32)
        h2 = (E2[:, l : l + L] - E2_base * pow2[l]).astype(jnp.int32)
        g0 = hash_jnp(h1, h2, vseed, vmask, 0)
        g1 = hash_jnp(h1, h2, vseed, vmask, 1)
        hit0 = (vkey_a[0][g0] == h1) & (vkey_b[0][g0] == h2)
        hit1 = (vkey_a[1][g1] == h1) & (vkey_b[1][g1] == h2)
        stored_l = jnp.where(hit0, vlen[0][g0], vlen[1][g1])
        stored_id = jnp.where(hit0, vid[0][g0], vid[1][g1])
        stored_sc = jnp.where(hit0, vscore[0][g0], vscore[1][g1])
        hit = valid & (hit0 | hit1) & (stored_l == l)
        costs.append(jnp.where(hit, stored_sc, NEGS))
        pids.append(jnp.where(hit, stored_id, -1))
    cost = jnp.stack(costs, axis=-1)  # [S, L, K]
    pid = jnp.stack(pids, axis=-1)

    lidx = jax.lax.broadcasted_iota(jnp.int32, pid.shape, 2) + 1
    has_single = jnp.any((lidx == charlen[..., None]) & (pid >= 0), axis=-1)
    unk_ok = s_ok & ~has_single & ((pos + charlen) <= lengths[:, None])
    unk_sel = unk_ok[..., None] & (lidx == charlen[..., None])
    cost = jnp.where(unk_sel, jnp.asarray(unk_score, sdtype), cost)
    pid = jnp.where(unk_sel, unk_id, pid)
    return cost, pid


def _ends_grid(cost, pid, max_len):
    """Node grid keyed by END boundary: entry (s, p-1, l-1) is the node
    ENDING at boundary p with length l (= begin grid shifted right by
    l-1)."""
    S, L, K = cost.shape
    ce = [
        _shift_prev(cost[..., l - 1], NEG, l - 1) if l > 1 else cost[..., 0]
        for l in range(1, max_len + 1)
    ]
    pe = [
        _shift_prev(pid[..., l - 1], -1, l - 1) if l > 1 else pid[..., 0]
        for l in range(1, max_len + 1)
    ]
    # a node ending at p must not begin before byte 0: the shift fill
    # (-1 pid) already guarantees that.
    return jnp.stack(ce, axis=-1), jnp.stack(pe, axis=-1)


def _lse_host(x, y):
    """Reference `log_sum_exp` (non-init branch, `lattice.rs:123`):
    vmax + log(exp(vmin - vmax) + 1), except vmax alone when
    vmax > vmin + 50."""
    vmax = jnp.where(x > y, x, y)
    vmin = jnp.where(x > y, y, x)
    big = vmax > vmin + 50.0
    safe = jnp.where(big, vmax, vmin)  # avoid exp overflow in dead lane
    return jnp.where(big, vmax, vmax + jnp.log(jnp.exp(safe - vmax) + 1.0))


# --------------------------------------------------------------------------
# programs
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_len", "n_pieces"))
def em_marginal_program(
    bytes_u8,
    lengths,
    freqs,
    vkey_a,
    vkey_b,
    vlen,
    vid,
    vscore,
    vseed,
    pow1,
    pow2,
    unk_id,
    unk_score,
    max_len,
    n_pieces,
):
    """-> (expected f64[n_pieces], z f64[S] = freq * logZ, ntok int32[S]).

    One E-step chunk: forward-backward marginals + Viterbi token counts
    (reference `run_e_step`, `trainer.rs:451-491`)."""
    S, L = bytes_u8.shape
    K = max_len
    b = bytes_u8.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    inb = pos < lengths[:, None]
    b = jnp.where(inb, b, 0)
    sdtype = vscore.dtype

    cost, pid = _piece_nodes(
        b, inb, lengths, vkey_a, vkey_b, vlen, vid, vscore, vseed,
        pow1, pow2, unk_id, unk_score, max_len,
    )
    ce, pe = _ends_grid(cost, pid, max_len)
    ce_t = jnp.transpose(ce, (1, 0, 2))  # [L, S, K]
    pe_t = jnp.transpose(pe, (1, 0, 2))

    # ---- forward: A[p] = fold over end nodes (begin-pos increasing =
    # length DEcreasing) of lse(A[p-l] + score), first node initializes;
    # positions with no end nodes keep alpha 0.0 (host leaves the default).
    def fwd_step(win, x):
        ce_row, pe_row = x  # [S, K]
        acc = jnp.zeros((S,), sdtype)
        has = jnp.zeros((S,), bool)
        cnt_acc = jnp.zeros((S,), jnp.int32)
        vbest = jnp.full((S,), NEG, sdtype)
        vcnt = jnp.zeros((S,), jnp.int32)
        vhas = jnp.zeros((S,), bool)
        a_win, v_win, c_win = win
        for l in range(K, 0, -1):
            exists = pe_row[:, l - 1] >= 0
            v = a_win[:, l - 1] + ce_row[:, l - 1]
            acc = jnp.where(exists, jnp.where(has, _lse_host(acc, v), v), acc)
            has = has | exists
            # viterbi fold (same order, first-writer strictly-greater)
            vv = v_win[:, l - 1] + ce_row[:, l - 1]
            take = exists & (~vhas | (vv > vbest))
            vbest = jnp.where(take, vv, vbest)
            vcnt = jnp.where(take, c_win[:, l - 1] + 1, vcnt)
            vhas = vhas | exists
        a_p = jnp.where(has, acc, jnp.zeros((S,), sdtype))
        v_p = jnp.where(vhas, vbest, jnp.asarray(NEG, sdtype))
        c_p = jnp.where(vhas, vcnt, 0)
        new = (
            jnp.concatenate([a_p[:, None], a_win[:, :-1]], axis=1),
            jnp.concatenate([v_p[:, None], v_win[:, :-1]], axis=1),
            jnp.concatenate([c_p[:, None], c_win[:, :-1]], axis=1),
        )
        return new, (a_p, v_p, c_p)

    a0 = jnp.zeros((S, K), sdtype).at[:, 0].set(0.0)
    # window slot j holds boundary p-1-j; before step p=1 that is boundary
    # -j: only slot 0 (boundary 0) is real — alpha 0, viterbi 0 reachable.
    v0 = jnp.full((S, K), NEG, sdtype).at[:, 0].set(0.0)
    c0 = jnp.zeros((S, K), jnp.int32)
    _, (alphas, _vit, cnts) = jax.lax.scan(
        fwd_step, (a0, v0, c0), (ce_t, pe_t)
    )
    alpha = jnp.concatenate(
        [jnp.zeros((1, S), sdtype), alphas], axis=0
    ).T  # [S, L+1]
    cnt = jnp.concatenate([jnp.zeros((1, S), jnp.int32), cnts], axis=0).T

    z_at = jnp.take_along_axis(alpha, lengths[:, None], axis=1)[:, 0]
    ntok = jnp.take_along_axis(cnt, lengths[:, None], axis=1)[:, 0]
    live = lengths > 0
    z = jnp.where(live, freqs * z_at, 0.0)
    ntok = jnp.where(live, ntok, 0)

    # ---- backward: B[p] = fold over begin nodes (length INcreasing) of
    # lse(score + B[p+l]); B beyond the sentence is never referenced.
    cost_t = jnp.transpose(cost, (1, 0, 2))
    pid_t = jnp.transpose(pid, (1, 0, 2))

    def bwd_step(b_win, x):
        c_row, p_row = x
        acc = jnp.zeros((S,), sdtype)
        has = jnp.zeros((S,), bool)
        for l in range(1, K + 1):
            exists = p_row[:, l - 1] >= 0
            v = c_row[:, l - 1] + b_win[:, l - 1]
            acc = jnp.where(exists, jnp.where(has, _lse_host(acc, v), v), acc)
            has = has | exists
        b_p = jnp.where(has, acc, jnp.zeros((S,), sdtype))
        new = jnp.concatenate([b_p[:, None], b_win[:, :-1]], axis=1)
        return new, b_p

    b0 = jnp.zeros((S, K), sdtype)
    _, betas = jax.lax.scan(
        bwd_step, b0, (cost_t, pid_t), reverse=True
    )
    beta = jnp.concatenate(
        [jnp.transpose(betas, (1, 0)), jnp.zeros((S, 1), sdtype)], axis=1
    )  # [S, L+1]; beta[p] = Beta at begin boundary p

    # ---- marginals: freq * exp(alpha[p] + score + beta[p+l] - Z) --------
    exists = pid >= 0
    a_at = alpha[:, :L]
    contribs = []
    for l in range(1, K + 1):
        b_pl = _shift_next(beta[:, : L + 1], jnp.asarray(0.0, sdtype), l)[:, :L]
        total = a_at + cost[..., l - 1] + b_pl - z_at[:, None]
        e = freqs[:, None] * jnp.exp(jnp.where(exists[..., l - 1], total, NEG))
        contribs.append(jnp.where(exists[..., l - 1], e, 0.0))
    contrib = jnp.stack(contribs, axis=-1)

    flat_pid = jnp.where(exists, pid, n_pieces).reshape(-1)
    expected = (
        jnp.zeros((n_pieces + 1,), sdtype)
        .at[flat_pid]
        .add(contrib.reshape(-1))[:n_pieces]
    )
    return expected, z, ntok


@functools.partial(jax.jit, static_argnames=("max_len", "n_pieces"))
def viterbi_freq_program(
    bytes_u8,
    lengths,
    freqs,
    vkey_a,
    vkey_b,
    vlen,
    vid,
    vscore,
    vseed,
    pow1,
    pow2,
    unk_id,
    unk_score,
    max_len,
    n_pieces,
):
    """-> (freq f64[n_pieces], ok bool[S]): per-piece Viterbi frequencies
    over the corpus — the pruning statistics loop of
    `prune_sentence_pieces` (`trainer.rs:320-357`).  Each sentence's
    Viterbi path pieces are credited with the sentence count; `ok` is
    False for sentences whose path exceeds L steps (never, by
    construction: one token needs >= 1 byte)."""
    S, L = bytes_u8.shape
    K = max_len
    b = bytes_u8.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    inb = pos < lengths[:, None]
    b = jnp.where(inb, b, 0)
    sdtype = vscore.dtype

    cost, pid = _piece_nodes(
        b, inb, lengths, vkey_a, vkey_b, vlen, vid, vscore, vseed,
        pow1, pow2, unk_id, unk_score, max_len,
    )
    ce, pe = _ends_grid(cost, pid, max_len)
    ce_t = jnp.transpose(ce, (1, 0, 2))
    pe_t = jnp.transpose(pe, (1, 0, 2))

    def step(win, x):
        ce_row, pe_row = x
        v_win, = win
        vbest = jnp.full((S,), NEG, sdtype)
        vlenb = jnp.zeros((S,), jnp.int32)
        vpid = jnp.full((S,), -1, jnp.int32)
        vhas = jnp.zeros((S,), bool)
        for l in range(K, 0, -1):
            exists = pe_row[:, l - 1] >= 0
            vv = v_win[:, l - 1] + ce_row[:, l - 1]
            take = exists & (~vhas | (vv > vbest))
            vbest = jnp.where(take, vv, vbest)
            vlenb = jnp.where(take, l, vlenb)
            vpid = jnp.where(take, pe_row[:, l - 1], vpid)
            vhas = vhas | exists
        v_p = jnp.where(vhas, vbest, jnp.asarray(NEG, sdtype))
        new = (jnp.concatenate([v_p[:, None], v_win[:, :-1]], axis=1),)
        return new, (vlenb, vpid)

    v0 = jnp.full((S, K), NEG, sdtype).at[:, 0].set(0.0)
    _, (jlens, jpids) = jax.lax.scan(step, (v0,), (ce_t, pe_t))
    # boundary arrays [S, L+1]: boundary 0 has no ending node
    jlen = jnp.concatenate(
        [jnp.zeros((S, 1), jnp.int32), jnp.transpose(jlens, (1, 0))], axis=1
    )
    jpid = jnp.concatenate(
        [jnp.full((S, 1), -1, jnp.int32), jnp.transpose(jpids, (1, 0))], axis=1
    )

    # gather-free backtrack: chain q -> q - jlen[q] from each sentence end
    seed = jnp.zeros((S, L + 1), bool).at[jnp.arange(S), lengths].set(
        lengths > 0
    )

    def bt_body(_, st):
        reach, front = st
        nxt = jnp.zeros((S, L + 1), bool)
        for d in range(1, K + 1):
            m = front & (jlen == d)
            nxt = nxt | _shift_next(m, False, d)
        front = nxt & ~reach
        return reach | front, front

    reach, _ = jax.lax.fori_loop(0, L, bt_body, (seed, seed))
    tok = reach & (jlen > 0)

    flat_pid = jnp.where(tok, jpid, n_pieces).reshape(-1)
    w = jnp.broadcast_to(freqs[:, None], (S, L + 1))
    freq = (
        jnp.zeros((n_pieces + 1,), sdtype)
        .at[flat_pid]
        .add(jnp.where(tok, w, 0.0).reshape(-1))[:n_pieces]
    )
    return freq, jnp.ones((S,), bool)


# --------------------------------------------------------------------------
# host driver (chunked, bucketed; optional mesh sharding with psum)
# --------------------------------------------------------------------------

_ELEM_BUDGET = 1 << 23  # f64 elements per [S, L, K] chunk tensor (~64MB)
L_MAX = 512  # sentences longer than this take the host lattice


def _bucket_len(n: int) -> int:
    L = 8
    while L < n:
        L <<= 1
    return L


class DeviceEm:
    """Packs the training sentences once; per model, builds a piece table
    and runs the chunked E-step / Viterbi-frequency programs.  With
    `mesh`, each chunk is evaluated under `shard_map` over the mesh's
    first axis with the expected-count vector `psum`'d across devices
    (SURVEY §2.9: DP E-step with psum of expectations)."""

    def __init__(self, sentences: List[Tuple[str, int]], mesh=None):
        self.mesh = mesh
        self.n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        buckets = {}
        self.host_idx: List[int] = []
        for i, (s, _n) in enumerate(sentences):
            bs = s.encode("utf-8")
            if not bs:
                continue
            if len(bs) > L_MAX:
                self.host_idx.append(i)
                continue
            buckets.setdefault(_bucket_len(len(bs)), []).append(i)
        self.chunks = []  # (bytes u8[S,L], lengths i32[S], freqs f64[S])
        for L, idxs in sorted(buckets.items()):
            s_cap = max(self.n_dev, _ELEM_BUDGET // (L * 16))
            s_cap -= s_cap % self.n_dev
            for lo in range(0, len(idxs), s_cap):
                part = idxs[lo : lo + s_cap]
                S = -(-len(part) // self.n_dev) * self.n_dev
                buf = np.zeros((S, L), np.uint8)
                lens = np.zeros(S, np.int32)
                fr = np.zeros(S, np.float64)
                for k, i in enumerate(part):
                    bs = sentences[i][0].encode("utf-8")
                    buf[k, : len(bs)] = np.frombuffer(bs, np.uint8)
                    lens[k] = len(bs)
                    fr[k] = float(sentences[i][1])
                self.chunks.append((buf, lens, fr, part))
        self.sentences = sentences

    def _table(self, model) -> Optional[PieceTable]:
        return PieceTable.build(model.vocab)

    def _run(self, program, model, want_z: bool):
        """Shared chunk loop; returns (vec f64[V], z_or_ok per sentence,
        extra per sentence) or None when no device table builds."""
        pt = self._table(model)
        if pt is None:
            return None
        unk_id = np.int32(model.unk_id if model.unk_id is not None else 0)
        unk_score = np.float64(model.min_score - 10.0)
        V = len(model.vocab)
        vec = np.zeros(V, np.float64)
        per_a = np.zeros(len(self.sentences), np.float64)
        per_b = np.zeros(len(self.sentences), np.int64)
        fn = program
        if self.mesh is not None:
            fn = self._sharded(program)
        with jax.enable_x64():
            # built under x64 so the f64 score table stays f64 on device
            kw = pt.device_args()
            for buf, lens, fr, idxs in self.chunks:
                out = fn(
                    jnp.asarray(buf),
                    jnp.asarray(lens),
                    jnp.asarray(fr),
                    unk_id=unk_id,
                    unk_score=unk_score,
                    max_len=pt.max_len,
                    n_pieces=V,
                    **kw,
                )
                v, a, *rest = out
                vec += np.asarray(v)[:V]
                a = np.asarray(a)
                for k, i in enumerate(idxs):
                    per_a[i] = a[k]
                if rest:
                    bb = np.asarray(rest[0])
                    for k, i in enumerate(idxs):
                        per_b[i] = bb[k]
        return vec, per_a, per_b

    def _sharded(self, program):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        axis = mesh.axis_names[0]

        def call(buf, lens, fr, **kw):
            def per_shard(buf, lens, fr):
                out = program(buf, lens, fr, **kw)
                vec = jax.lax.psum(out[0], axis)
                return (vec,) + tuple(out[1:])

            n_out = 3 if program is em_marginal_program else 2
            outs = (P(),) + (P(axis),) * (n_out - 1)
            return shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis)),
                out_specs=outs,
                check_vma=False,
            )(buf, lens, fr)

        return call

    # ---------------------------------------------------------------- API

    def e_step(self, model):
        """-> (expected f64[V], z f64[S sentences], ntok total) or None.
        Long sentences (> L_MAX bytes) are folded in with host lattices."""
        out = self._run(em_marginal_program, model, want_z=True)
        if out is None:
            return None
        expected, z, ntok = out
        if self.host_idx:
            from ..models.unigram_lattice import Lattice

            exp_list = [0.0] * len(model.vocab)
            for i in self.host_idx:
                s, n = self.sentences[i]
                lat = Lattice(s, model.bos_id, model.eos_id)
                model.populate_nodes(lat)
                z[i] = lat.populate_marginal(float(n), exp_list)
                ntok[i] = len(lat.viterbi())
            expected = expected + np.asarray(exp_list)
        return expected, z, int(ntok.sum())

    def viterbi_freq(self, model):
        """-> freq f64[V] or None (pruning statistics)."""
        out = self._run(viterbi_freq_program, model, want_z=False)
        if out is None:
            return None
        freq, _ok, _ = out
        if self.host_idx:
            from ..models.unigram_lattice import Lattice

            for i in self.host_idx:
                s, n = self.sentences[i]
                lat = Lattice(s, model.bos_id, model.eos_id)
                model.populate_nodes(lat)
                for node in lat.viterbi():
                    freq[node.id] += float(n)
        return freq
