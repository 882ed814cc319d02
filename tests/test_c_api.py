"""C ABI binding conformance (native/c_api.cpp, reference parity with
`bindings/c/src/lib.rs`): build the shared library, compile the C driver,
run it as a real external process, and compare against the Python API."""

import os
import subprocess
import sys
import sysconfig

import pytest

from tokenizers_tpu.native import build_c_api
from tokenizers_tpu.tokenizer import Tokenizer

FIXTURE = "tests/fixtures/gpt2/tokenizer.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def driver(tmp_path_factory):
    so = build_c_api()
    out = str(tmp_path_factory.mktemp("capi") / "driver")
    libdir = sysconfig.get_config_var("LIBDIR")
    subprocess.run(
        [
            "gcc",
            "-O1",
            os.path.join(REPO, "tests", "c_api_driver.c"),
            "-o",
            out,
            so,
            f"-Wl,-rpath,{os.path.dirname(so)}",
            f"-Wl,-rpath,{libdir}",
        ],
        check=True,
        capture_output=True,
    )
    return out


def run_driver(driver, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [driver, os.path.join(REPO, FIXTURE), *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return dict(
        line.split(":", 1) for line in r.stdout.strip().split("\n") if ":" in line
    )


def test_c_encode_matches_python(driver):
    tok = Tokenizer.from_file(FIXTURE)
    text = "Hello world, don't stop!"
    got = run_driver(driver, text)
    exp = tok.encode(text)
    assert [int(x) for x in got["ids"].split()] == exp.ids
    assert got["tokens"].split() == exp.tokens
    assert [
        tuple(map(int, p.split("-"))) for p in got["offsets"].split()
    ] == exp.offsets
    assert got["decode"].strip() == tok.decode(exp.ids)


def test_c_encode_pair(driver):
    tok = Tokenizer.from_file(FIXTURE)
    got = run_driver(driver, "first part", "second part")
    exp = tok.encode("first part", "second part")
    assert [int(x) for x in got["ids"].split()] == exp.ids


def test_c_encode_batch(driver):
    """tokenizers_encode_batch + tokenizers_encoding_len via the driver's
    --batch mode (the entry points the Node binding calls)."""
    batch = ["Hello world!", "don't stop", "  x"]
    out = run_driver(driver, "--batch", *batch)
    tok = Tokenizer.from_file(FIXTURE)
    expect = [e.ids for e in tok.encode_batch_fast(batch)]
    got = [
        [int(x) for x in out[f"ids[{i}]"].split()] for i in range(len(batch))
    ]
    assert got == expect


def test_c_train(driver, tmp_path):
    """tokenizers_train_from_files with a JSON trainer config."""
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("hug hugs hugging pug pugs mug smug hug hugs\n" * 4)
    import json

    cfg = tmp_path / "empty_bpe.json"
    cfg.write_text(
        json.dumps(
            {
                "version": "1.0",
                "model": {"type": "BPE", "vocab": {}, "merges": []},
                "pre_tokenizer": {"type": "Whitespace"},
            }
        )
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [driver, str(cfg), "--train", str(corpus)],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    assert r.returncode == 0, r.stderr
    assert "trained_encode_len:" in r.stdout
    n = int(r.stdout.split("trained_encode_len:")[1].split()[0])
    assert 1 <= n <= 3
