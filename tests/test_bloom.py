"""Bloom filter: host semantics, device probe parity, ECBF file format."""

import os
import subprocess

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecloop_tpu import bloom


def rand_hashes(rng, n):
    return np.array([[rng.randrange(2**32) for _ in range(5)]
                     for _ in range(n)], dtype=np.uint32)


def ref_probe_bits(h, nbits):
    """Straight python-int transcription of the probe semantics for oracle
    use (u64 shifts, mod size*64)."""
    h = [int(v) for v in h]
    a = [h[0] << 32 | h[1], h[2] << 32 | h[3], h[4] << 32 | h[0],
         h[1] << 32 | h[2], h[3] << 32 | h[4]]
    out = []
    for s in (24, 28, 36, 40):
        for i in range(5):
            idx = ((a[i] << s) | (a[(i + 1) % 5] >> s)) % 2**64
            out.append(idx % nbits)
    return out


def test_probe_indices_host_match_oracle(rng):
    hs = rand_hashes(rng, 16)
    nbits = 4096 * 64
    got = bloom.probe_indices_host(hs) % np.uint64(nbits)
    for row, h in zip(got, hs):
        assert [int(v) for v in row] == ref_probe_bits(h, nbits)


def test_host_bloom_add_has(rng):
    hs = rand_hashes(rng, 200)
    blf = bloom.BloomFilter(2 * 200)
    blf.add_many(hs[:100])
    assert bloom.probe_indices_host(hs[0]).shape == (20,)
    assert blf.has_many(hs[:100]).all()
    # false-positive rate should be far below 1 for the other 100
    assert blf.has_many(hs[100:]).sum() <= 5


def test_file_roundtrip(tmp_path, rng):
    hs = rand_hashes(rng, 50)
    blf = bloom.BloomFilter.for_count(1000)
    blf.add_many(hs)
    p = str(tmp_path / "t.blf")
    blf.save(p)
    blf2 = bloom.BloomFilter.load(p)
    assert blf2.size == blf.size
    assert (blf2.bits == blf.bits).all()
    assert blf2.has_many(hs).all()


def test_file_header_layout(tmp_path):
    blf = bloom.BloomFilter(3)
    blf.bits[:] = [1, 2, 3]
    p = str(tmp_path / "t.blf")
    blf.save(p)
    raw = open(p, "rb").read()
    assert raw[:4] == bytes.fromhex("46424345")  # 0x45434246 LE
    assert raw[4:8] == (1).to_bytes(4, "little")
    assert raw[8:16] == (3).to_bytes(8, "little")
    assert len(raw) == 16 + 3 * 8


def test_device_probe_exact_matches_host(rng):
    hs = rand_hashes(rng, 128)
    # deliberately non-power-of-2 size (like real blf-gen output)
    blf = bloom.BloomFilter.for_count(77)
    assert (blf.nbits & (blf.nbits - 1)) != 0
    blf.add_many(hs[:64])
    bits = jnp.asarray(blf.as_u32())
    probe = jax.jit(bloom.probe_exact, static_argnames="nbits")
    got = np.asarray(probe(jnp.asarray(hs), bits, nbits=blf.nbits))
    want = blf.has_many(hs)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size_words", [1, 2, 1000, 12345])
def test_barrett_mod_various_sizes(rng, size_words):
    nbits = size_words * 64
    his = jnp.asarray(np.array([rng.randrange(2**32) for _ in range(64)],
                               dtype=np.uint32))
    los = jnp.asarray(np.array([rng.randrange(2**32) for _ in range(64)],
                               dtype=np.uint32))
    w32, b5 = jax.jit(bloom._barrett_mod, static_argnames="m")(his, los, m=nbits)
    for h, l, w, b in zip(np.asarray(his), np.asarray(los),
                          np.asarray(w32), np.asarray(b5)):
        r = ((int(h) << 32) | int(l)) % nbits
        assert (int(w), int(b)) == (r >> 5, r & 31)


def test_pow2_prefilter_superset(rng):
    hs = rand_hashes(rng, 300)
    bits, log2b = bloom.build_pow2(hs[:200])
    dev = jax.jit(bloom.probe_pow2, static_argnames=("log2_bits", "nprobes"))
    got = np.asarray(dev(jnp.asarray(hs), jnp.asarray(bits), log2_bits=log2b))
    assert got[:200].all()            # no false negatives
    assert got[200:].sum() <= 10      # low fp


REF = "/root/reference"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_blf_gen_byte_parity_with_reference(tmp_path, rng):
    """Build the reference binary and compare .blf files byte-for-byte."""
    exe = tmp_path / "ecloop_ref"
    r = subprocess.run(["cc", "-O2", "-pthread", f"{REF}/main.c", "-lm",
                        "-o", str(exe)], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"reference build failed: {r.stderr[:200]}")

    hashes = ["%040x" % rng.randrange(2**160) for _ in range(500)]
    stdin = "\n".join(hashes) + "\n"
    ref_path = tmp_path / "ref.blf"
    subprocess.run([str(exe), "blf-gen", "-n", "500", "-o", str(ref_path)],
                   input=stdin.encode(), check=True, capture_output=True)

    blf = bloom.BloomFilter.for_count(500)
    seen = []
    for hx in hashes:
        h = np.array([int(hx[i:i + 8], 16) for i in range(0, 40, 8)],
                     dtype=np.uint32)
        if blf.has_many(h[None])[0]:
            continue  # reference dedupes via self-probe
        blf.add_many(h[None])
    ours = tmp_path / "ours.blf"
    blf.save(str(ours))
    assert ref_path.read_bytes() == ours.read_bytes()


def test_adaptive_probe_count():
    # empty filter -> 1 probe; saturated -> all 20
    assert bloom.adaptive_probe_count(np.zeros(64, dtype=np.uint64)) == 1
    assert bloom.adaptive_probe_count(
        np.full(64, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)) == 20
    # reference-sized filter (p=1e-9, fill ~= 37%) -> well under 20
    blf = bloom.BloomFilter.for_count(2048)
    blf.add_many(rand_hashes(__import__("random").Random(7), 2048))
    k = bloom.adaptive_probe_count(blf.bits)
    assert 4 <= k < 20


def test_probe_exact_reduced_is_superset(rng):
    """Device prefilter with nprobes<20 must pass every true member
    (host confirm handles the extra survivors)."""
    hs = rand_hashes(rng, 64)
    blf = bloom.BloomFilter.for_count(64)
    blf.add_many(hs[:48])
    bits32 = jnp.asarray(blf.as_u32())
    probe = jax.jit(bloom.probe_exact, static_argnames=("nbits", "nprobes"))
    full = np.asarray(probe(jnp.asarray(hs), bits32, nbits=blf.nbits,
                            nprobes=20))
    red = np.asarray(probe(jnp.asarray(hs), bits32, nbits=blf.nbits,
                           nprobes=6))
    assert full[:48].all() and red[:48].all()
    assert (red | ~full).all()        # reduced is a superset of full
