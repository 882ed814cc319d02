#!/usr/bin/env python
"""Benchmark: batched byte-level BPE encode (gpt2) on the current backend.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is sustained device encode throughput (bytes of input text per
second) on the reference's own flagship config — GPT-2 byte-level BPE batch
encode (reference harness `tokenizers/benches/bpe_benchmark.rs:28-68`).

`vs_baseline` is measured against the reference Rust implementation
(`tokenizers` wheel, all CPU threads) on the same corpus on this machine when
available, else against the reference README's stated 1GB/<20s => 50 MB/s
(`/root/reference/README.md:22-23`).
"""

import json
import os
import sys
import time

os.environ.setdefault("TOKENIZERS_PARALLELISM", "true")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests/fixtures/gpt2/tokenizer.json")
CORPUS = os.path.join(REPO, "tests/fixtures/corpus.txt")

DOC_BYTES = 8 * 1024  # uniform docs -> single compiled shape
TARGET_BATCH_BYTES = 1 << 25  # 32 MB of text per timed batch


def build_docs():
    text = open(CORPUS, encoding="utf-8").read()
    while len(text.encode("utf-8")) < TARGET_BATCH_BYTES * 1.1:
        text += text
    data = text.encode("utf-8")
    docs = []
    off = 0
    while off + DOC_BYTES <= len(data) and sum(map(len, docs)) < TARGET_BATCH_BYTES:
        chunk = data[off : off + DOC_BYTES]
        # cut at a UTF-8 boundary
        while chunk and (chunk[-1] & 0xC0) == 0x80:
            chunk = chunk[:-1]
        docs.append(chunk.decode("utf-8"))
        off += DOC_BYTES
    return docs


def bench_device(docs):
    import jax

    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(FIXTURE)
    eng = tok._get_device_engine()
    assert eng is not None

    nbytes = sum(len(d.encode("utf-8")) for d in docs)

    def run():
        outs = eng.encode_batch_arrays(docs)
        for ids, ntok, _ in outs:
            ids.block_until_ready()
        return outs

    run()  # warmup + compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return nbytes / best


def bench_reference(docs):
    try:
        from tokenizers import Tokenizer as RefTok
    except ImportError:
        return 50e6  # README's stated 1GB / <20s
    ref = RefTok.from_file(FIXTURE)
    nbytes = sum(len(d.encode("utf-8")) for d in docs)
    ref.encode_batch_fast(docs)  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ref.encode_batch_fast(docs)
        best = min(best, time.perf_counter() - t0)
    return nbytes / best


def main():
    docs = build_docs()
    dev = bench_device(docs)
    ref = bench_reference(docs)
    print(
        json.dumps(
            {
                "metric": "gpt2_bpe_batch_encode_throughput",
                "value": round(dev / 1e6, 2),
                "unit": "MB/s",
                "vs_baseline": round(dev / ref, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
