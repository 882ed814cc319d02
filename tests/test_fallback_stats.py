"""Host-fallback residue is counted and stays under its ceiling.

The device engines silently re-encode row_bad rows on the host (overlong
words, buffer overflow, unigram near-ties — `ops/engine_base.py`).  A
silent rise in that residue would mask device regressions (the r3 class of
bug where whole-chunk poisoning zeroed outputs), and at GB/s targets a
fraction-of-a-percent host path becomes the bottleneck — so the fractions
are process-global counters (`engine_base.STATS`), emitted by bench.py,
and ceiling-asserted here on a realistic corpus slice.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenizers_tpu import Tokenizer
from tokenizers_tpu.ops import engine_base

HERE = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(HERE, "fixtures", "corpus.txt")


def _docs(n=48, size=8192):
    # BENCH doc size (8KB — bench.py DOC_BYTES): the r4 ceilings used 2KB
    # docs and green-lit engines that fell over at bench geometry (40.8%
    # unigram row fallback); doc size is what drives the long-word and
    # capacity failure modes, so the ceilings are asserted at it.
    text = open(CORPUS, encoding="utf-8").read()
    return [text[i * size : (i + 1) * size] for i in range(n)]


def _residue(fixture, docs, force_dedup=False):
    tok = Tokenizer.from_file(
        os.path.join(HERE, "fixtures", fixture, "tokenizer.json")
    )
    eng = tok._get_device_engine()
    assert eng is not None
    if force_dedup:
        # the CPU test backend defaults to the dense x64 path; the bench
        # ceiling is about the dedup program, so force it
        eng._use_dedup = lambda: True
    engine_base.STATS.reset()
    encs = eng.encode_batch(docs, True)
    assert all(e is not None for e in encs)
    snap = engine_base.STATS.snapshot()
    assert snap["device_rows"] > 0, "nothing reached the device program"
    return snap


def test_gpt2_fallback_residue_under_ceiling():
    # exercise the big-bucket branch structure (dedup-or-host, the bench
    # path) at bench DOC length but CPU-compilable chunk shapes: doc
    # length is what drives the long-word/capacity failure modes
    os.environ["TOKENIZERS_TPU_BIG_BUCKET_MIN"] = str(1 << 17)
    os.environ["TOKENIZERS_TPU_POSITION_BUDGET"] = str(1 << 17)
    try:
        snap = _residue("gpt2", _docs(n=32))
    finally:
        del os.environ["TOKENIZERS_TPU_BIG_BUCKET_MIN"]
        del os.environ["TOKENIZERS_TPU_POSITION_BUDGET"]
    # corpus slice is ordinary prose/code: bad rows must stay rare
    assert snap["bad_row_fraction"] <= 0.005, snap


def test_unigram_fallback_residue_under_ceiling():
    # near-ties and >UD_SLACK words are WORD-level patch records (r5):
    # the row stays on device and the host splices the few flagged words,
    # so the row-fallback ceiling is tight even at bench doc sizes
    os.environ["TOKENIZERS_TPU_POSITION_BUDGET"] = str(1 << 17)
    try:
        snap = _residue("unigram", _docs(n=24), force_dedup=True)
    finally:
        del os.environ["TOKENIZERS_TPU_POSITION_BUDGET"]
    assert snap["bad_row_fraction"] <= 0.01, snap


def test_stats_count_host_pre_routing():
    tok = Tokenizer.from_file(
        os.path.join(HERE, "fixtures", "gpt2", "tokenizer.json")
    )
    eng = tok._get_device_engine()
    engine_base.STATS.reset()
    eng.encode_batch(["plain text", "has <|endoftext|> inside"], True)
    snap = engine_base.STATS.snapshot()
    assert snap["total_inputs"] == 2
    assert snap["host_pre_inputs"] == 1  # the added-token input
