"""The Node addon source must compile (syntax + N-API signature check)
against the vendored stable-ABI declarations — no Node toolchain in this
image, so this is the build gate for bindings/node/src/binding.cc
(reference Node binding: `bindings/node/src/tokenizer.rs` via napi-rs)."""

import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_node_binding_compiles():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    p = subprocess.run(
        ["sh", os.path.join(ROOT, "bindings/node/check_build.sh")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    assert "check OK" in p.stdout
