"""The dedup'd WordPiece program (ops/wordpiece_dedup.py, the off-CPU
ASCII path) must match the dense oracle program token-for-token on the
fixture corpus and edge cases."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tokenizers_tpu.ops.packing import pack_batch
from tokenizers_tpu.tokenizer import Tokenizer

BERT = "tests/fixtures/bert/tokenizer.json"


def test_dedup_matches_dense():
    from tokenizers_tpu.ops.wordpiece_dedup import wordpiece_dedup_program

    tok = Tokenizer.from_file(BERT)
    eng = tok._get_device_engine()
    assert eng is not None and eng.ascii_ok

    lines = [
        l
        for l in open("tests/fixtures/corpus.txt").read().split("\n")
        if l and l.isascii()
    ][:48]
    lines += [
        "",
        "   ",
        "a",
        "hello world!",
        "unbelievable transformations",
        "x" * 600,  # word over WORD_CAP: whole row -> host flag
        "zzqqy zzqqy unmatchablezzz",  # repeated + [UNK] words
        "a.b.c!d?e",  # punctuation isolation
        "the the the the the the",  # heavy dedup
    ]
    byte_strings = [eng._prepare(s) for s in lines]
    for buf, lengths, orig in pack_batch(byte_strings):
        dense = eng._run(buf, lengths, False)
        dd = wordpiece_dedup_program(
            buf,
            lengths,
            eng.d_ascii_nb,
            eng.d_ascii_cls,
            eng.d_vrows0,
            eng.d_vrows1,
            eng.vseed,
            eng.d_pow1,
            eng.d_pow2,
            eng.unk_id,
            max_len=eng.max_len,
            max_word_chars=eng.max_word_chars,
        )
        d_ids, d_ntok, d_bad = (np.asarray(x) for x in dense)
        p_ids, p_ntok, p_bad = (np.asarray(x) for x in dd)
        for r, i in enumerate(orig):
            if p_bad[r]:
                continue  # dedup path may host-flag rows the dense handles
            assert not d_bad[r], lines[i]
            assert d_ntok[r] == p_ntok[r], (lines[i], d_ntok[r], p_ntok[r])
            n = d_ntok[r]
            np.testing.assert_array_equal(
                d_ids[r, :n], p_ids[r, :n], err_msg=repr(lines[i])
            )
