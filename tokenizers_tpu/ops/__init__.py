"""Device kernels: packed-byte batch tokenization on TPU (JAX/XLA/Pallas).

Importing this package enables JAX's persistent compilation cache (keyed per
backend), so per-(B, L)-bucket program compiles are paid once per machine,
not once per process.
"""

import os


def _enable_compilation_cache():
    """Single source of truth for the persistent-compile-cache policy.

    Opt out with TOKENIZERS_TPU_COMPCACHE=0/false/no/off, or by pre-setting
    jax_compilation_cache_dir yourself."""
    if os.environ.get("TOKENIZERS_TPU_COMPCACHE", "1").strip().lower() in (
        "0", "false", "no", "off",
    ):
        return
    try:
        import jax

        # The CPU backend serializes AOT executables whose machine-feature
        # stamps don't survive this fleet's heterogeneous hosts (observed:
        # SIGILL warnings on load, SIGSEGV in the cache write path).  The
        # cache only pays off for the remote TPU backend's minutes-long
        # compiles anyway, so enable it only when the PRIMARY platform is
        # not cpu.  (Substring matching was wrong: the default platform
        # string here is "axon,cpu" — cpu as *fallback* — and the r3 guard
        # `"cpu" in plats` disabled the cache on the TPU backend entirely,
        # which is why every r3 bench config compiled cold.)
        plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        primary = plats.split(",")[0].strip().lower()
        if primary == "cpu":
            return
        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "tokenizers_tpu", "jax_cache"
            )
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compilation_cache()
