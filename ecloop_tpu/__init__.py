"""ecloop-tpu: a TPU-native secp256k1 key-search engine (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the CPU reference tool
vladkens/ecloop (see SURVEY.md): `add` (batch-addition range search),
`mul` (windowed-gtable scalar multiplication over key lists), `rnd`
(randomized bit-window search), GLV endomorphism expansion, compressed /
uncompressed hash160 derivation and bloom-filter candidate matching —
re-designed TPU-first: 256-bit field arithmetic as 16-bit limb planes in
32-bit vector lanes, batched over thousands of curve points per step, the
full point->serialize->SHA-256->RIPEMD-160->bloom pipeline on device, and
scalar-range sharding over `jax.sharding.Mesh` for multi-chip scale.
"""

__version__ = "0.1.0"


def enable_compile_cache(cache_dir: str | None = None) -> bool:
    """Turn on the persistent XLA compile cache — TPU only.

    The search-step graphs are large (hundreds of fused modmuls) and
    compiles are the dominant cold cost on device, so CLI/bench entry
    points call this once the backend choice is known.  Deliberately
    NOT done at import time and NOT on CPU: reloading disk-cached
    XLA:CPU AOT executables trips machine-feature mismatch checks
    (+prefer-no-gather etc.) and intermittently segfaults, and probing
    the backend at import time can hang when the device tunnel is down.
    Returns True when the cache was enabled.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("ECLOOP_CACHE_DIR",
                                   "/tmp/ecloop_jax_cache")
    if not cache_dir:
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend == "cpu":
        return False
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return True
