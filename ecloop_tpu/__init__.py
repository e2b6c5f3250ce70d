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

import os as _os

if _os.environ.get("ECLOOP_JAX_CACHE", "1") == "1":
    # persistent XLA compile cache: the field/hash graphs are large
    # (hundreds of fused modmuls) and host compile is the dominant cold
    # cost — cache them across processes/runs.
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_CACHE", "/tmp/ecloop_jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
