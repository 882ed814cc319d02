"""Compile-cost budget: the lowered bench programs stay small.

Compile cost is a first-class performance axis of this architecture: the
serialized TPU executables are what a warm start must load, and r4's bench
died because program growth (an unrolled merge ladder doubled the scan
executable to 125MB) turned every config into a minutes-long cold compile.
This fast-tier test lowers the flagship scan program at a CPU-tractable
shape with the BIG-bucket branch structure forced (the bench path) and
asserts ceilings on the StableHLO size — a backend-independent proxy that
scales with the executable (r5 measured: 4.65MB StableHLO -> 92MB
serialized; 4.26MB -> 46MB after the structure cuts).

If this fails, a structural change (new cond branch, unrolled loop, extra
ladder rung) multiplied the compiled program — fix the structure or
consciously raise the budget WITH a fresh on-TPU compile-time measurement
(tools/program_size.py --small; PERF.md "Compile economics").
"""

import os
import sys

import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# StableHLO ceilings at the test shape (measured r5: 4.20MB for the bpe
# scan body at (32, 8192) big-bucket structure — nearly identical to the
# full bench shape's 4.26MB, i.e. structure-dominated, which is what
# makes this a valid CI proxy; 5.52MB after the radix-4 butterflies,
# which triple per-stage ops but halve the stage/pass count).  ~15%
# headroom: the guarded failure mode is a structural DOUBLING (r4's
# extra ladder rung), not drift.
BPE_SCAN_CEILING = 6_300_000
MAX_WHILE_LOOPS = 12
MAX_CONDS = 10


def test_bpe_scan_program_size_budget():
    os.environ["TOKENIZERS_TPU_BIG_BUCKET_MIN"] = str(1 << 18)
    try:
        from tools.program_size import gpt2_scan

        low = gpt2_scan(2, 32, 8192, True, False)
        txt = low.as_text()
    finally:
        del os.environ["TOKENIZERS_TPU_BIG_BUCKET_MIN"]
    assert len(txt) < BPE_SCAN_CEILING, (
        f"bpe scan program lowered to {len(txt)/1e6:.2f}MB StableHLO "
        f"(budget {BPE_SCAN_CEILING/1e6:.2f}MB): a structural change "
        "multiplied the compiled program; see tests/test_program_size.py"
    )
    n_while = txt.count("stablehlo.while")
    n_cond = txt.count("stablehlo.case") + txt.count("stablehlo.if")
    assert n_while <= MAX_WHILE_LOOPS, n_while
    assert n_cond <= MAX_CONDS, n_cond
