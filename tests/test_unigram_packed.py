"""The word-packed Unigram program (ops/unigram_packed.py) must produce
identical Encodings to the dense oracle (ops/unigram_encode.py) on the
fixture corpus, including offsets and word indices."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tokenizers_tpu.ops.packing import pack_batch
from tokenizers_tpu.tokenizer import Tokenizer

UNIGRAM = "tests/fixtures/unigram/tokenizer.json"


def _run(eng, prog, buf, lengths, with_offsets):
    import jax as _jax

    with _jax.enable_x64():
        return prog(
            buf,
            lengths,
            cls_s1=eng.d_cls_s1,
            cls_s2=eng.d_cls_s2,
            vkey_a=eng.d_vkey_a,
            vkey_b=eng.d_vkey_b,
            vlen=eng.d_vlen,
            vid=eng.d_vid,
            vscore=eng.d_vscore,
            vseed=eng.vseed,
            pow1=eng.d_pow1,
            pow2=eng.d_pow2,
            unk_id=eng.unk_id,
            unk_score=eng.unk_score,
            max_len=eng.max_len,
            with_offsets=with_offsets,
        )


@pytest.mark.parametrize("with_offsets", [False, True])
def test_packed_matches_dense(with_offsets):
    from tokenizers_tpu.ops.unigram_encode import unigram_program
    from tokenizers_tpu.ops.unigram_packed import unigram_program_packed

    tok = Tokenizer.from_file(UNIGRAM)
    eng = tok._get_device_engine()
    assert eng is not None

    lines = [
        l
        for l in open("tests/fixtures/corpus.txt").read().split("\n")
        if l
    ][:48]
    lines += ["", "   ", "a", "hello world", "x " * 30, "don't stop"]
    byte_strings = [eng._prepare(s) for s in lines]
    for buf, lengths, orig in pack_batch(byte_strings):
        dense = _run(eng, unigram_program, buf, lengths, with_offsets)
        packed = _run(eng, unigram_program_packed, buf, lengths, with_offsets)
        d_ids, d_ntok, d_bad = dense[0], dense[1], dense[2]
        p_ids, p_ntok, p_bad = packed[0], packed[1], packed[2]
        d_ids, p_ids = np.asarray(d_ids), np.asarray(p_ids)
        d_ntok, p_ntok = np.asarray(d_ntok), np.asarray(p_ntok)
        d_bad, p_bad = np.asarray(d_bad), np.asarray(p_bad)
        for r in range(len(orig)):
            if d_bad[r] or p_bad[r]:
                # packed capacity (PACK_SLACK bytes/word) is tighter than
                # the dense path's BT_CAP chars: packed may flag rows the
                # dense path handles, never the reverse
                assert bool(p_bad[r]) or not bool(d_bad[r]), (
                    r, lines[orig[r]])
                continue
            assert d_ntok[r] == p_ntok[r], (r, lines[orig[r]])
            n = d_ntok[r]
            np.testing.assert_array_equal(
                d_ids[r, :n], p_ids[r, :n], err_msg=str(lines[orig[r]])
            )
            if with_offsets:
                for k in (3, 4, 5):
                    np.testing.assert_array_equal(
                        np.asarray(dense[k])[r, :n],
                        np.asarray(packed[k])[r, :n],
                        err_msg=f"field {k} row {r}: {lines[orig[r]]!r}",
                    )
