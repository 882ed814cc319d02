"""DistributedBpeTrainer: data-parallel BPE training over a device mesh.

Produces *identical* vocab/merges to the host `BpeTrainer` (and therefore to
the reference `tokenizers/src/models/bpe/trainer.rs`), with the O(corpus)
per-merge work — occurrence finding, merge application, pair-count deltas —
running sharded on device and reduced with deterministic `psum`s
(see `ops/bpe_train_step.py`).  The host keeps only the tiny serial state:
token minting, the pair registry index, and the stop conditions.

Per-round device work is gather-free (shift-fills) except registry hash
lookups over the *packed* merge sites; the packing capacity adapts to the
selected pair's count (a pair's occurrence count bounds its site count), so
early high-frequency merges recompile at a larger capacity and the long
tail runs with a small one.

Mesh axis: 'data' (corpus words sharded). Works on any mesh size including a
single chip; multi-host meshes shard W across all chips with counts reduced
over ICI/DCN.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..added_vocabulary import AddedToken
from ..trainers.bpe_trainer import BpeTrainer
from .. import ops as _ops  # noqa: F401  (enables the compilation cache)
from ..ops.bpe_train_step import PairRegistry, make_round

UPDATE_CAP = 16384  # padded size of per-round registry insert scatters


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _apply_updates(reg_a, reg_b, count, slot_rows, ui, ua, ub, uc, us, urow):
    p_cap = reg_a.shape[0]
    H = slot_rows.shape[0]
    reg_a = jnp.concatenate([reg_a, jnp.full((1,), -1, jnp.int32)])
    reg_b = jnp.concatenate([reg_b, jnp.full((1,), -1, jnp.int32)])
    count = jnp.concatenate([count, jnp.zeros((1,), jnp.int32)])
    slot_rows = jnp.concatenate(
        [slot_rows, jnp.full((1, 4), -1, jnp.int32)], axis=0
    )
    reg_a = reg_a.at[ui].set(ua, mode="drop")[:p_cap]
    reg_b = reg_b.at[ui].set(ub, mode="drop")[:p_cap]
    count = count.at[ui].add(uc, mode="drop")[:p_cap]
    slot_rows = slot_rows.at[us].set(urow, mode="drop")[:H]
    return reg_a, reg_b, count, slot_rows


class DistributedBpeTrainer:
    """Same configuration surface as `BpeTrainer`; `train` runs on device."""

    def __init__(self, mesh: Optional[Mesh] = None, **kwargs):
        self.base = BpeTrainer(**kwargs)
        self.mesh = mesh

    @property
    def words(self):
        return self.base.words

    def feed(self, iterator, process):
        self.base.feed(iterator, process)

    def train(self, model) -> List[AddedToken]:
        return self.do_train(self.base.words, model)

    # ------------------------------------------------------------------ train

    def do_train(self, word_counts: Dict[str, int], model) -> List[AddedToken]:
        cfg = self.base
        # single-chip meshes have nothing to shard: the host trainer (with
        # its native C++ merge loop — the same split the reference makes,
        # rayon threads + native hot loop) is strictly faster than paying
        # one device pass per merge.  TOKENIZERS_TPU_TRAINER=device forces
        # the device path (used by its tests); multi-chip meshes always
        # shard on device.  Decide BEFORE touching jax.devices(): backend
        # init costs ~0.1 s on CPU and multiple seconds through the axon
        # relay, which the host path must never pay.
        import os as _os

        pref = _os.environ.get("TOKENIZERS_TPU_TRAINER", "auto").lower()
        mesh = self.mesh
        if pref != "device" and (mesh is None or mesh.devices.size == 1):
            return self.base.do_train(word_counts, model)
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        ndev = mesh.devices.size

        word_to_id: Dict[str, int] = {}
        id_to_word: List[str] = []
        max_token_length = (
            cfg.max_token_length if cfg.max_token_length is not None else 1 << 30
        )

        for token in cfg.special_tokens:
            if token.content not in word_to_id:
                id_to_word.append(token.content)
                word_to_id[token.content] = len(id_to_word) - 1
        cfg._compute_alphabet(word_counts, word_to_id, id_to_word)
        words, counts = cfg._tokenize_words(word_counts, word_to_id, id_to_word)

        # ---- device-resident whole-loop path (one dispatch, all merges) --
        from ..ops.bpe_train_dense import train_dense, verify_merges
        from ..utils.log import get_logger

        try:
            dm, ok = train_dense(
                word_counts, cfg, word_to_id, id_to_word, words, counts, mesh
            )
        except Exception as e:  # pragma: no cover - device fallback
            get_logger("trainer").warning("dense trainer failed (%s); per-round path", e)
            dm, ok = None, False
        if ok:
            w2 = dict(word_to_id)
            i2 = list(id_to_word)
            if verify_merges(dm, cfg, w2, i2):
                self._finalize(
                    model, w2, i2, [((a, b), nid) for a, b, nid in dm]
                )
                return list(cfg.special_tokens)
            get_logger("trainer").warning(
                "dense trainer hash-identity mismatch; per-round path"
            )

        v_cap = max(cfg.vocab_size, len(id_to_word)) + 1
        # ---- pack corpus -------------------------------------------------
        W = len(words)
        K = max((len(w) for w, _ in words), default=1)
        K = max(K, 2)
        Wp = -(-max(W, 1) // ndev) * ndev
        ids_np = np.full((Wp, K), -1, np.int32)
        wc_np = np.zeros(Wp, np.int32)
        for i, (w, _lens) in enumerate(words):
            n = len(w)
            if n == 0:
                continue
            ids_np[i, :n] = w
            wc_np[i] = counts[i]

        # ---- initial pair counts (host, vectorized) ----------------------
        a = ids_np[:, :-1].reshape(-1).astype(np.int64)
        b = ids_np[:, 1:].reshape(-1).astype(np.int64)
        wrep = np.repeat(wc_np, K - 1).astype(np.int64)
        ok = (a >= 0) & (b >= 0)
        keys = a[ok] * v_cap + b[ok]
        uniq, inv = np.unique(keys, return_inverse=True)
        csum = np.bincount(inv, weights=wrep[ok]).astype(np.int64)
        pairs = {
            (int(k // v_cap), int(k % v_cap)): int(c)
            for k, c in zip(uniq, csum)
        }

        n_merges_budget = max(0, cfg.vocab_size - len(id_to_word))
        p_cap = len(pairs) + 8 * max(256, n_merges_budget) + UPDATE_CAP
        p_cap = -(-p_cap // 65536) * 65536  # bucket: stable compiled shapes
        reg = PairRegistry(pairs, p_cap)

        # ---- device state ------------------------------------------------
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        d_words = jax.device_put(ids_np, shard)
        d_wc = jax.device_put(wc_np, shard)
        d_reg_a = jax.device_put(reg.reg_a, repl)
        d_reg_b = jax.device_put(reg.reg_b, repl)
        d_count = jax.device_put(reg.count, repl)
        d_slot_rows = jax.device_put(reg.slot_rows, repl)
        d_id2len = jax.device_put(np.ones(v_cap, np.int32), repl)

        max_count = int(max(pairs.values(), default=1))
        site_cap = 1 << max(12, (max_count + 1).bit_length())
        site_cap = min(site_cap, 1 << 21)
        select_jit, round_jit = make_round(mesh, p_cap, v_cap, site_cap)

        merges: List[Tuple[Tuple[int, int], int]] = []
        id2len_host: Dict[int, int] = {}
        touched: List[int] = []

        while len(word_to_id) < cfg.vocab_size:
            best, sa, sb = select_jit(d_reg_a, d_reg_b, d_count)
            best = int(best)
            sa = int(sa)
            sb = int(sb)
            if best < 1 or cfg.min_frequency > best:
                break
            if best > site_cap:  # resize packing capacity, recompile rounds
                site_cap = 1 << (best + 1).bit_length()
                select_jit, round_jit = make_round(
                    mesh, p_cap, v_cap, site_cap
                )

            part_a = id_to_word[sa]
            part_b = id_to_word[sb]
            if cfg.continuing_subword_prefix and part_b.startswith(
                cfg.continuing_subword_prefix
            ):
                part_b = part_b[len(cfg.continuing_subword_prefix) :]
            new_token = part_a + part_b
            new_id = word_to_id.get(new_token, len(id_to_word))
            if new_token not in word_to_id:
                id_to_word.append(new_token)
                word_to_id[new_token] = new_id
            merges.append(((sa, sb), new_id))
            new_len = id2len_host.get(sa, 1) + id2len_host.get(sb, 1)
            id2len_host[new_id] = new_len
            sel_idx = reg.index[(sa, sb)]

            (
                d_words,
                d_count,
                d_id2len,
                dl,
                dr,
                _merged,
                overflow,
            ) = round_jit(
                d_words,
                d_wc,
                d_count,
                d_slot_rows,
                d_id2len,
                jnp.int32(sa),
                jnp.int32(sb),
                jnp.int32(sel_idx),
                jnp.int32(new_id),
                jnp.int32(new_len),
                jnp.int32(max_token_length),
            )
            # one batched device->host transfer per round
            dl, dr, overflow = jax.device_get((dl, dr, overflow))
            if int(overflow):
                raise RuntimeError(
                    "site packing overflowed despite count pre-check"
                )

            upd: List[Tuple[int, int, int, int]] = []
            for x in np.nonzero(dl)[0]:
                upd.append(self._upsert(reg, int(x), new_id, int(dl[x]), touched))
            for y in np.nonzero(dr)[0]:
                upd.append(self._upsert(reg, new_id, int(y), int(dr[y]), touched))
            all_touched = touched[:]
            touched.clear()
            if upd or all_touched:
                n_chunks = -(-max(len(upd), len(all_touched)) // UPDATE_CAP)
                for c0 in range(n_chunks):
                    chunk = upd[c0 * UPDATE_CAP : (c0 + 1) * UPDATE_CAP]
                    tchunk = all_touched[c0 * UPDATE_CAP : (c0 + 1) * UPDATE_CAP]
                    ui = np.full(UPDATE_CAP, p_cap, np.int32)
                    ua = np.zeros(UPDATE_CAP, np.int32)
                    ub = np.zeros(UPDATE_CAP, np.int32)
                    uc = np.zeros(UPDATE_CAP, np.int32)
                    us = np.full(UPDATE_CAP, reg.H, np.int32)
                    urow = np.full((UPDATE_CAP, 4), -1, np.int32)
                    for j, (idx, aa, bb, dc) in enumerate(chunk):
                        ui[j] = idx
                        ua[j] = aa
                        ub[j] = bb
                        uc[j] = dc
                    for j, sl in enumerate(tchunk):
                        us[j] = sl
                        urow[j] = reg.slot_rows[sl]
                    d_reg_a, d_reg_b, d_count, d_slot_rows = _apply_updates(
                        d_reg_a,
                        d_reg_b,
                        d_count,
                        d_slot_rows,
                        jnp.asarray(ui),
                        jnp.asarray(ua),
                        jnp.asarray(ub),
                        jnp.asarray(uc),
                        jnp.asarray(us),
                        jnp.asarray(urow),
                    )

        self._finalize(model, word_to_id, id_to_word, merges)
        return list(cfg.special_tokens)

    def _finalize(self, model, word_to_id, id_to_word, merges):
        cfg = self.base
        model.vocab = dict(word_to_id)
        model.vocab_r = {v: k for k, v in model.vocab.items()}
        model.merges = {p: (i, nid) for i, (p, nid) in enumerate(merges)}
        model.merges_list = [
            (id_to_word[p[0]], id_to_word[p[1]]) for p, _ in merges
        ]
        model.continuing_subword_prefix = cfg.continuing_subword_prefix
        model.end_of_word_suffix = cfg.end_of_word_suffix
        if model.cache is not None:
            model.cache.clear()

    def _upsert(self, reg: PairRegistry, a: int, b: int, delta: int, touched):
        """Host registry upsert; returns (idx, a, b, delta) for the device
        scatter.  New-token pairs are usually fresh, but when the minted
        token id collides with an existing token the pair may exist."""
        idx = reg.index.get((a, b))
        if idx is None:
            idx = reg.insert(a, b, 0, touched=touched)
        return (idx, a, b, delta)
