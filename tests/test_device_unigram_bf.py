"""Byte-fallback Unigram device engine conformance (VERDICT r2 item 5).

The unigram_bf fixture is the unigram fixture's vocab extended with all 256
`<0xXX>` pieces and `byte_fallback: true` (Llama-2-style SPM semantics,
reference `models/unigram/model.rs:429-446`): every unk span — after
fuse_unk — expands into one byte token per UTF-8 byte of the normalized
span, each carrying the whole span's offsets.  Golden ids/offsets in
tests/fixtures/golden.json are produced by the reference wheel
(tests/fixtures/make_fixtures.py).
"""

import json
import os

import numpy as np
import pytest

import jax

from tokenizers_tpu.ops.packing import pack_batch
from tokenizers_tpu.ops.unigram_dedup import unigram_dedup_program
from tokenizers_tpu.tokenizer import Tokenizer

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures", "unigram_bf", "tokenizer.json")
GOLD = os.path.join(HERE, "fixtures", "golden.json")

# small deterministic slice: natural lines + the unicode/control edge cases
# (the tail of the golden sample), CJK fused spans included
N_HEAD = 24


def _sample_and_gold():
    g = json.load(open(GOLD))
    sample = g["sample"]
    fx = g["fixtures"]["unigram_bf"]
    idxs = list(range(N_HEAD)) + list(range(len(sample) - 10, len(sample)))
    return (
        [sample[i] for i in idxs],
        [fx["ids"][i] for i in idxs],
        [fx["offsets"][i] for i in idxs],
    )


@pytest.fixture(scope="module")
def tok():
    return Tokenizer.from_file(FIX)


def test_engine_builds_with_byte_fallback(tok):
    eng = tok._get_device_engine()
    assert eng is not None, "byte_fallback fixture must get a device engine"
    assert eng.d_bf is not None
    assert int(np.asarray(eng.d_bf).min()) >= 0  # complete 256-piece table


def test_fast_ids_match_wheel(tok):
    sample, gold_ids, _ = _sample_and_gold()
    encs = tok.encode_batch_fast(sample)
    for s, e, ref in zip(sample, encs, gold_ids):
        assert e.ids == ref, repr(s[:60])


def test_offsets_match_wheel(tok):
    sample, gold_ids, gold_offs = _sample_and_gold()
    encs = tok.encode_batch(sample)
    for s, e, rid, roff in zip(sample, encs, gold_ids, gold_offs):
        assert e.ids == rid, repr(s[:60])
        assert [list(o) for o in e.offsets] == roff, repr(s[:60])


def test_dedup_program_matches_wheel(tok):
    eng = tok._get_device_engine()
    sample, gold_ids, _ = _sample_and_gold()
    byte_strings = [eng._prepare(s) for s in sample]
    n_bad = 0
    for buf, lens, orig in pack_batch(byte_strings):
        ids, ntok, bad, ptab, nflag = unigram_dedup_program(
            buf, lens, word_cache=False, **eng._dedup_args()
        )
        ids, ntok, bad = map(np.asarray, (ids, ntok, bad))
        ptab, n = np.asarray(ptab), int(nflag)
        patches: dict = {}
        if 0 < n <= ptab.shape[0]:
            for rec in ptab[:n]:
                patches.setdefault(int(rec[0]), []).append(rec)
        for k, i in enumerate(orig):
            if bad[k]:  # host fallback: allowed, must be rare
                n_bad += 1
                continue
            row = ids[k][: ntok[k]]
            recs = patches.get(k)
            if recs:  # near-tie/long words: host splice, row stays device
                row = eng._apply_patches(byte_strings[i], row, recs)
                assert row is not None
            assert row.tolist() == gold_ids[i], repr(sample[i][:60])
    assert n_bad <= len(sample) // 4
