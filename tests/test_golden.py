"""Golden-model self-checks against the reference data fixtures."""

from pathlib import Path

from ecloop_tpu import golden as g

DATA = Path(__file__).resolve().parent.parent / "data"


def read_lines(name):
    return [ln.strip() for ln in (DATA / name).read_text().splitlines()
            if ln.strip() and not ln.startswith("#")]


def test_ripemd160_spec_vectors():
    vecs = {
        b"": "9c1185a5c5e9fc54612808977ee8f548b2258d31",
        b"a": "0bdc9d2d256b3ee9daae347be6f4dc835a467ffe",
        b"abc": "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc",
        b"message digest": "5d0689ef49d2fae572b881b123a85ffa21595f36",
        b"abcdefghijklmnopqrstuvwxyz": "f71c27109c692c1b56bbdceb5b9d2865b3708dbc",
    }
    for msg, want in vecs.items():
        assert g.ripemd160(msg).hex() == want


def test_curve_basics():
    assert g.on_curve(g.G)
    assert g.point_mul(g.N) is None
    p2 = g.point_mul(2)
    assert g.on_curve(p2)
    assert p2 == g.point_dbl(g.G)
    assert g.point_add(p2, g.point_neg(g.G)) == g.G
    # lambda endomorphism: (beta*x, y) == lambda*k * G
    k = 0xDEADBEEFCAFE
    x, y = g.point_mul(k)
    assert g.point_mul(k * g.LAMBDA1 % g.N) == (g.BETA1 * x % g.P, y)


def test_puzzle_addresses_match_fixture_hashes():
    addrs = read_lines("btc-puzzles-addr")
    hashes = read_lines("btc-puzzles-hash")
    assert len(addrs) == len(hashes) == 160
    for a, h in zip(addrs, hashes):
        assert g.address_to_h160(a).hex() == h


def test_known_puzzle_solutions():
    """The 9 puzzle keys in range 8000:ffffff (reference `make add` vector)."""
    hashes = set(read_lines("btc-puzzles-hash"))
    solutions = [0xC936, 0x1764F, 0x3080D, 0x5749F, 0xD2C55,
                 0x1BA534, 0x2DE40F, 0x556E52, 0xDC2A04]
    for k in solutions:
        assert 0x8000 <= k < 0xFFFFFF
        assert g.addr33(g.point_mul(k)).hex() in hashes


def test_brainwallet_sample(rng):
    """Spot-check the 1080-key mul vector on a random sample (full set is
    covered by the e2e mul test)."""
    privs = [int(x, 16) for x in read_lines("btc-bw-priv")]
    targets = set(read_lines("btc-bw-hash"))
    assert len(privs) == 1080 and len(targets) == 1080
    hits = 0
    for k in rng.sample(privs, 40):
        pt = g.point_mul(k)
        hits += g.addr33(pt).hex() in targets
        hits += g.addr65(pt).hex() in targets
    assert hits >= 20  # each key matches via at least ~1 encoding on average


def test_endo_priv_recovers_points():
    k = 0x123456789ABCDEF0FEDCBA
    pts = g.endo_points(g.point_mul(k))
    assert len(set(pts)) == 6
    for i, pt in enumerate(pts):
        assert g.point_mul(g.endo_priv(k, i)) == pt
