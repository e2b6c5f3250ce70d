"""Hash pipeline vs hashlib / golden RIPEMD-160."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ecloop_tpu import fe, golden, hash160 as h160

j_sha = jax.jit(h160.sha256_compress)
j_addr33 = jax.jit(h160.addr33_hash)
j_addr65 = jax.jit(h160.addr65_hash)


def test_sha256_single_block(rng):
    """Random 55-byte-or-less messages, padded on host, vs hashlib."""
    msgs = [bytes(rng.randrange(256) for _ in range(rng.randrange(56)))
            for _ in range(32)]
    blocks = []
    for m in msgs:
        buf = bytearray(m) + b"\x80" + b"\x00" * (55 - len(m))
        buf += (len(m) * 8).to_bytes(8, "big")
        blocks.append([int.from_bytes(buf[i:i + 4], "big") for i in range(0, 64, 4)])
    w = jnp.asarray(np.array(blocks, dtype=np.uint32))
    out = np.asarray(j_sha(w))
    for m, row in zip(msgs, out):
        want = hashlib.sha256(m).digest()
        got = b"".join(int(v).to_bytes(4, "big") for v in row)
        assert got == want


def test_rmd160_compress(rng):
    """One-block RMD vs golden ripemd160 on 32-byte messages."""
    msgs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(16)]
    blocks = []
    for m in msgs:
        buf = bytearray(m) + b"\x80" + b"\x00" * 23
        buf += (256).to_bytes(8, "little")
        blocks.append([int.from_bytes(buf[i:i + 4], "little")
                       for i in range(0, 64, 4)])
    w = jnp.asarray(np.array(blocks, dtype=np.uint32))
    out = np.asarray(jax.jit(h160.rmd160_compress)(w))
    for m, row in zip(msgs, out):
        got = b"".join(int(v).to_bytes(4, "little") for v in row)
        assert got == golden.ripemd160(m)


def _points(rng, n):
    ks = [rng.randrange(1, golden.N) for _ in range(n)]
    pts = [golden.point_mul(k) for k in ks]
    x = jnp.asarray(fe.ints_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(fe.ints_to_limbs([p[1] for p in pts]))
    return pts, x, y


def test_addr33(rng):
    pts, x, y = _points(rng, 32)
    got = h160.h160_to_hex(j_addr33(x, y))
    assert got == [golden.addr33(p).hex() for p in pts]


def test_addr65(rng):
    pts, x, y = _points(rng, 32)
    got = h160.h160_to_hex(j_addr65(x, y))
    assert got == [golden.addr65(p).hex() for p in pts]


def test_addr33_parity_both_prefixes():
    """Ensure both 02 and 03 prefixes occur and hash correctly."""
    pts = [golden.point_mul(k) for k in (1, 2, 3, 4, 5, 6, 7, 8)]
    parities = {p[1] & 1 for p in pts}
    assert parities == {0, 1}
    x = jnp.asarray(fe.ints_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(fe.ints_to_limbs([p[1] for p in pts]))
    assert h160.h160_to_hex(j_addr33(x, y)) == [golden.addr33(p).hex() for p in pts]


def test_known_puzzle_hash():
    """puzzle #1 (pk=1) compressed hash160 is the first fixture line."""
    x = jnp.asarray(fe.ints_to_limbs([golden.GX]))
    y = jnp.asarray(fe.ints_to_limbs([golden.GY]))
    assert h160.h160_to_hex(j_addr33(x, y))[0] == \
        "751e76e8199196d454941c45d1b3a323f1433bd6"


def test_h160_hex_roundtrip(rng):
    hx = "%040x" % rng.randrange(2**160)
    assert h160.h160_to_hex(h160.hex_to_h160(hx)[None])[0] == hx
