"""Native C++ host runtime vs Python golden model cross-checks.

The native library is an *independent* implementation (native/
ecloop_host.cpp); agreement with the Python golden model on random
inputs is a two-oracle consistency proof for both.
"""

import hashlib
import os
import random

import numpy as np
import pytest

from ecloop_tpu import bloom, golden, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_sha256_and_hash160():
    for msg in [b"", b"abc", b"x" * 33, b"y" * 65, os.urandom(100)]:
        assert native.hash160(msg) == golden.hash160(msg)


def test_ec_mul_g_matches_golden(rng):
    for _ in range(20):
        k = rng.randrange(1, golden.N)
        assert native.ec_mul_g(k) == golden.point_mul(k)
    assert native.ec_mul_g(golden.N) is None
    assert native.ec_mul_g(1) == golden.G


def test_pk_hash160_oracle(rng):
    for _ in range(10):
        k = rng.randrange(1, golden.N)
        pt = golden.point_mul(k)
        assert native.pk_hash160(k, True) == golden.addr33(pt)
        assert native.pk_hash160(k, False) == golden.addr65(pt)


def test_bloom_parity_with_python(rng):
    hashes = np.array([[rng.getrandbits(32) for _ in range(5)]
                       for _ in range(200)], dtype=np.uint32)
    blf = bloom.BloomFilter.for_count(200)
    blf.add_many(hashes[:100])

    nat = bloom.BloomFilter.for_count(200)
    native.bloom_add(nat.bits, hashes[:100])
    assert np.array_equal(blf.bits, nat.bits)

    py_has = blf.has_many(hashes)
    c_has = native.bloom_has(blf.bits, hashes)
    assert np.array_equal(py_has, c_has)
    assert c_has[:100].all()


def test_list_search(rng):
    rows = np.array(sorted(
        [tuple(rng.getrandbits(32) for _ in range(5)) for _ in range(500)]),
        dtype=np.uint32)
    for i in [0, 1, 250, 499]:
        assert native.list_search(rows, rows[i]) == i
    missing = rows[13].copy()
    missing[4] ^= 1
    if not any((rows == missing).all(axis=1)):
        assert native.list_search(rows, missing) == -1
    mask = native.list_search_batch(rows, rows[:50])
    assert mask.all()


def test_parse_h160_lines():
    text = b"# comment line\n" + b"ab" * 20 + b"\n  " + b"cd" * 20 + \
        b"  \nzz\n" + b"12" * 20 + b"\n"
    rows = native.parse_h160_lines(text)
    assert rows.shape == (3, 5)
    assert rows[0, 0] == 0xABABABAB
    assert rows[1, 0] == 0xCDCDCDCD


def test_parse_key_lines():
    text = b"ff\n" + b"0123456789abcdef" * 4 + b"\n\nnot-hex!\n1\n"
    keys = native.parse_key_lines(text)
    assert keys.shape == (3, 32)
    assert int.from_bytes(keys[0].tobytes(), "big") == 0xFF
    assert int.from_bytes(keys[1].tobytes(), "big") == int(
        "0123456789abcdef" * 4, 16)
    assert int.from_bytes(keys[2].tobytes(), "big") == 1


def test_parity_with_reference_fixture_files():
    from pathlib import Path
    data = Path(__file__).resolve().parent.parent / "data"
    text = (data / "btc-bw-hash").read_bytes()
    rows = native.parse_h160_lines(text)
    # fixture has 1080 hashes + 1 comment line
    assert len(rows) == 1080
    keys = native.parse_key_lines((data / "btc-bw-priv").read_bytes())
    assert len(keys) == 1080
