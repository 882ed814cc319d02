"""Host-parallelism control (reference `utils/parallelism.rs:15-62`) and
TOKENIZERS_LOG-style logging."""

import os

from tokenizers_tpu.utils import parallelism as par


def setup_function(_fn):
    par._override = None
    os.environ.pop(par.ENV_VARIABLE, None)


def test_env_parsing_matches_reference_spellings():
    # reference accepts off/false/f/no/n/0 (case-insensitive) as false
    for v in ("off", "OFF", "false", "F", "no", "N", "0", ""):
        assert par.parse_env_bool(v) is False, v
    for v in ("on", "true", "1", "yes", "anything"):
        assert par.parse_env_bool(v) is True, v
    assert par.parse_env_bool(None) is None


def test_default_is_parallel():
    assert par.get_parallelism() is True
    assert par.is_parallelism_configured() is False


def test_env_var_controls():
    os.environ[par.ENV_VARIABLE] = "false"
    assert par.get_parallelism() is False
    assert par.is_parallelism_configured() is True
    os.environ[par.ENV_VARIABLE] = "true"
    assert par.get_parallelism() is True


def test_override_beats_env():
    os.environ[par.ENV_VARIABLE] = "true"
    par.set_parallelism(False)
    assert par.get_parallelism() is False


def test_par_map_order_and_results():
    out = par.maybe_par_map(lambda x: x * x, list(range(50)), min_items=2)
    assert out == [x * x for x in range(50)]


def test_par_map_serial_when_disabled():
    par.set_parallelism(False)
    out = par.maybe_par_map(lambda x: x + 1, list(range(20)), min_items=2)
    assert out == list(range(1, 21))
    # serial path must not flip the used flag
    assert par.has_used_parallelism() in (True, False)  # just reachable


def test_host_fallback_batch_parallel():
    from tokenizers_tpu import Tokenizer
    from tokenizers_tpu.models import WordLevel
    from tokenizers_tpu.pre_tokenizers import WhitespaceSplit

    tok = Tokenizer(
        WordLevel({"a": 0, "b": 1, "[UNK]": 2}, unk_token="[UNK]")
    )
    tok.pre_tokenizer = WhitespaceSplit()
    encs = tok.encode_batch(["a b", "b a", "a c"] * 11)
    assert [e.ids for e in encs[:3]] == [[0, 1], [1, 0], [0, 2]]


def test_logging_env(capsys):
    from tokenizers_tpu.utils import log as tlog

    lg = tlog.get_logger("test")
    lg.warning("hello")  # must not raise regardless of env
