"""CLI layer tests: arg parsing, blf-gen/blf-check subcommands, usage."""

import io
import sys

import numpy as np
import pytest

from ecloop_tpu import bloom, cli, golden


def run_cli(argv, stdin=""):
    old_in, old_out = sys.stdin, sys.stdout
    sys.stdin = io.StringIO(stdin)
    sys.stdout = io.StringIO()
    try:
        rc = cli.main(["ecloop"] + argv)
        return rc, sys.stdout.getvalue()
    finally:
        sys.stdin, sys.stdout = old_in, old_out


def test_usage_and_version():
    rc, out = run_cli([])
    assert rc == 0 and "Usage:" in out and "blf-gen" in out
    rc, out = run_cli(["-v"])
    assert rc == 0 and out.startswith("ecloop-tpu v")


def test_args_helpers():
    a = cli.Args(["x", "add", "-t", "4", "-q", "-f", "file.txt"])
    assert a.get_bool("-q") and not a.get_bool("-endo")
    assert a.get_uint("-t", 1) == 4
    assert a.get_str("-f") == "file.txt"
    assert a.get_str("-o") is None


def test_parse_range_errors():
    with pytest.raises(SystemExit):
        cli.parse_range(cli.Args(["x", "add", "-r", "8000"]))
    with pytest.raises(SystemExit):
        cli.parse_range(cli.Args(["x", "add", "-r", "1:ffff"]))  # start <= 2048
    with pytest.raises(SystemExit):
        cli.parse_range(cli.Args(["x", "add", "-r", "ffff:8000"]))
    s, e = cli.parse_range(cli.Args(["x", "add", "-r", "8000:ffff"]))
    assert (s, e) == (0x8000, 0xFFFF)
    s, e = cli.parse_range(cli.Args(["x", "add"]))
    assert s == cli.GROUP_INV_SIZE and e == golden.P


def test_parse_offs_size():
    from ecloop_tpu.search.rnd import Rng
    rng = Rng("t")
    offs, size = cli.parse_offs_size(
        cli.Args(["x", "add"]), 0xFFFFFFFF, "add", rng)
    assert (offs, size) == (0, 32)
    offs, size = cli.parse_offs_size(
        cli.Args(["x", "add", "-d", "128:32"]), 1 << 255, "add", rng)
    assert size == 32 and offs <= 255
    with pytest.raises(SystemExit):
        cli.parse_offs_size(
            cli.Args(["x", "add", "-d", "0:10"]), 1 << 63, "add", rng)
    with pytest.raises(SystemExit):
        cli.parse_offs_size(
            cli.Args(["x", "add", "-d", "999:32"]), 1 << 63, "add", rng)


def test_offs_size_reference_clamping_table():
    """Parity of the SINGLE -d implementation (rnd.default_offs_size,
    which cli.parse_offs_size now delegates to — VERDICT r3 weak #5)
    against the reference's load_offs_size semantics (main.c:703-746):
      range_bits = bitlen(range_e)
      default_bits = max(20, range_bits) if range_bits < 32 else 32
      max_offs = max(1, max(20, range_bits) - default_bits)
      explicit -d -> (min(max_offs, offs), size), size clamped [20, 64].
    Both entry points must agree on every row."""
    from ecloop_tpu.search.rnd import Rng, default_offs_size
    rng = Rng("t")

    #       range_e,   -d raw,     expected (offs, size)
    table = [
        (0xFFFF,       None,       (0, 20)),    # 16 bits -> default 20
        (0xFFFFF,      None,       (0, 20)),    # 20 bits
        (1 << 30,      None,       (0, 31)),    # 31 bits -> default 31
        (0xFFFFFFFF,   None,       (0, 32)),    # 32 bits -> default 32
        (1 << 255,     None,       (0, 32)),    # 256 bits
        (1 << 255,     (128, 32),  (128, 32)),  # inside max_offs=224
        (1 << 255,     (230, 32),  (224, 32)),  # clamped to max_offs
        (1 << 255,     (255, 64),  (224, 64)),  # offs=255 valid pre-clamp
        (1 << 39,      (10, 20),   (8, 20)),    # 40 bits -> max_offs=8
        (0xFFFF,       (5, 20),    (1, 20)),    # max_offs floors at 1
    ]
    for range_e, d, want in table:
        offs_in = d[0] if d else None
        size_in = d[1] if d else None
        got = default_offs_size(range_e, offs_in, size_in, rng, is_rnd=False)
        assert got == want, (hex(range_e), d, got, want)
        argv = ["x", "add"] + (["-d", f"{d[0]}:{d[1]}"] if d else [])
        got_cli = cli.parse_offs_size(cli.Args(argv), range_e, "add", rng)
        assert got_cli == want, (hex(range_e), d, got_cli, want)

    # error rows (reference exits 1)
    for bad in ((256, 32), (0, 19), (0, 65)):
        with pytest.raises(ValueError):
            default_offs_size(1 << 255, bad[0], bad[1], rng, is_rnd=False)

    # rnd with no -d: random offset in [0, max_offs), default size
    for range_e, max_offs, dflt in ((1 << 255, 224, 32), (0xFFFF, 1, 20)):
        offs, size = default_offs_size(range_e, None, None, rng, is_rnd=True)
        assert 0 <= offs < max_offs and size == dflt


def test_blf_gen_and_check_roundtrip(tmp_path):
    h1 = "11" * 20
    h2 = "22" * 20
    path = str(tmp_path / "f.blf")
    rc, out = run_cli(["blf-gen", "-n", "64", "-o", path],
                      stdin=f"{h1}\n{h2}\n{h1}\n")
    assert rc == 0
    assert "added 2" in out and "1 duplicates" in out

    rc, out = run_cli(["blf-check", "-f", path, h1, h2])
    assert rc == 0
    assert out.count("FOUND") == 2

    rc, out = run_cli(["blf-check", "-f", path, "33" * 20])
    assert rc == 1
    assert "NOT FOUND" in out

    # incremental update of same-size filter (utils.c:430-445)
    h3 = "44" * 20
    rc, out = run_cli(["blf-gen", "-n", "64", "-o", path], stdin=f"{h3}\n")
    assert rc == 0
    blf = bloom.BloomFilter.load(path)
    for h in (h1, h2, h3):
        arr = np.array([int(h[i:i + 8], 16) for i in range(0, 40, 8)],
                       dtype=np.uint32)
        assert blf.has_many(arr[None])[0]


def test_blf_gen_errors(tmp_path):
    with pytest.raises(SystemExit):
        run_cli(["blf-gen", "-o", str(tmp_path / "x.blf")])
    with pytest.raises(SystemExit):
        run_cli(["blf-gen", "-n", "64", "-o", str(tmp_path / "x.txt")])


def test_status_line_formatting(capsys):
    st = cli.Status(quiet=False, outfile=None, use_color=False)
    st.k_checked = 2_000_000
    st.finished = True
    st._print_unlocked()
    err = capsys.readouterr().err
    assert "Mkeys/s" in err and "2,000,000" in err


def test_found_output_file(tmp_path):
    from ecloop_tpu.search.common import Found
    out = tmp_path / "found.txt"
    st = cli.Status(quiet=True, outfile=str(out), use_color=False)
    f = Found(label="addr33", h160="ab" * 20, priv=0x1234)
    st.write_found(f)
    st.finish()
    line = out.read_text().strip()
    assert line == f"addr33\t{'ab' * 20}\t{0x1234:064x}"


def test_to_hash_tool():
    sys.path.insert(0, "tools")
    try:
        import to_hash
    finally:
        sys.path.pop(0)
    # genesis address (public knowledge vector)
    assert (to_hash.addr_to_hash160("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa")
            == "62e907b15cbf27d5425399ebf6f0fb50ebb88f18")
    # bech32 vector: bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4 (BIP-173)
    assert (to_hash.addr_to_hash160(
        "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4")
        == "751e76e8199196d454941c45d1b3a323f1433bd6")
    assert to_hash.addr_to_hash160("notanaddress") is None


def _write_filter(tmp_path, keys, compressed=True):
    lines = []
    for k in keys:
        pt = golden.point_mul(k)
        h = golden.addr33(pt) if compressed else golden.addr65(pt)
        lines.append(h.hex())
    p = tmp_path / "targets.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_cmd_add_end_to_end_multidevice(tmp_path, monkeypatch):
    """Full `add` CLI path on the virtual mesh: -t 2 must shard and find
    the same keys as the reference semantics dictate."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    monkeypatch.setenv("ECLOOP_CENTERS", "4")
    monkeypatch.setenv("ECLOOP_GROUP_K", "64")
    monkeypatch.setenv("ECLOOP_LANES", "64")
    monkeypatch.setenv("ECLOOP_STEPS_PER_CALL", "1")
    targets = [0x10007, 0x10123]
    filt_path = _write_filter(tmp_path, targets)
    out = tmp_path / "found.txt"
    rc, _ = run_cli(["add", "-f", filt_path, "-r", "10000:10400",
                     "-t", "2", "-q", "-o", str(out)])
    assert rc == 0
    privs = sorted(int(ln.split("\t")[2], 16)
                   for ln in out.read_text().splitlines())
    assert privs == sorted(targets)


def test_cmd_mul_end_to_end_multidevice(tmp_path, monkeypatch):
    """Full `mul` CLI path with -t 2: jobs shard over the mesh
    (VERDICT r1 #2) and progress counts drained keys."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    monkeypatch.setenv("ECLOOP_CENTERS", "4")
    monkeypatch.setenv("ECLOOP_GROUP_K", "64")
    monkeypatch.setenv("ECLOOP_LANES", "64")
    monkeypatch.setenv("ECLOOP_MUL_BATCH", "32")
    keys = [3, 0xDEADBEEF, 0x12345]
    filt_path = _write_filter(tmp_path, keys)
    out = tmp_path / "found.txt"
    stdin = "\n".join(f"{k:064x}" for k in keys + [0x999]) + "\n"
    rc, _ = run_cli(["mul", "-f", filt_path, "-t", "2", "-q",
                     "-o", str(out)], stdin=stdin)
    assert rc == 0
    privs = sorted(int(ln.split("\t")[2], 16)
                   for ln in out.read_text().splitlines())
    assert privs == sorted(keys)


def test_cmd_rnd_prints_iteration_summary(tmp_path, monkeypatch, capsys):
    """rnd prints the per-iteration `found / checked ~ secs` line
    (reference main.c:653-656) and the random-mode banner."""
    monkeypatch.setenv("ECLOOP_CENTERS", "4")
    monkeypatch.setenv("ECLOOP_GROUP_K", "64")
    monkeypatch.setenv("ECLOOP_LANES", "64")
    monkeypatch.setenv("ECLOOP_STEPS_PER_CALL", "1")
    target = 0x10111
    filt_path = _write_filter(tmp_path, [target])
    out = tmp_path / "found.txt"
    # 2^20-bit window over a 2^10 range: first draw clamps to the full
    # range -> exactly one iteration, then exits
    rc, stdout = run_cli(["rnd", "-f", filt_path, "-r", "10000:10400",
                          "-d", "0:20", "-seed", "s", "-t", "1",
                          "-q", "-o", str(out)])
    assert rc == 0
    assert "[random mode] offs: 0 ~ bits: 20" in stdout
    import re
    assert re.search(r"\d[\d,]* / \d[\d,]* ~ \d+\.\ds", stdout)
    assert f"{target:064x}" in out.read_text()
