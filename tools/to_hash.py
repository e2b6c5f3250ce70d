#!/usr/bin/env python3
"""Convert Bitcoin addresses (base58 P2PKH / bech32 P2WPKH) to hex hash160.

Counterpart of the reference's to_hash.py (/root/reference/to_hash.py:12-29),
written fresh on the standard base58check / BIP-0173 algorithms with no
third-party deps.  Reads addresses from stdin or argv, prints one 40-hex
hash160 per line; non-address lines are skipped.
"""

import hashlib
import sys

B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
BECH = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"


def b58check_decode(addr: str) -> bytes | None:
    v = 0
    for ch in addr:
        i = B58.find(ch)
        if i < 0:
            return None
        v = v * 58 + i
    raw = v.to_bytes((v.bit_length() + 7) // 8, "big")
    raw = b"\x00" * (len(addr) - len(addr.lstrip("1"))) + raw
    if len(raw) < 5:
        return None
    payload, check = raw[:-4], raw[-4:]
    if hashlib.sha256(hashlib.sha256(payload).digest()).digest()[:4] != check:
        return None
    return payload


def _bech32_polymod(values):
    gen = (0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3)
    chk = 1
    for v in values:
        top = chk >> 25
        chk = ((chk & 0x1FFFFFF) << 5) ^ v
        for i in range(5):
            chk ^= gen[i] if ((top >> i) & 1) else 0
    return chk


def bech32_decode(addr: str) -> bytes | None:
    addr = addr.lower()
    if "1" not in addr:
        return None
    hrp, data = addr.rsplit("1", 1)
    try:
        vals = [BECH.index(c) for c in data]
    except ValueError:
        return None
    exp = [ord(c) >> 5 for c in hrp] + [0] + [ord(c) & 31 for c in hrp]
    if _bech32_polymod(exp + vals) != 1:  # bech32 (not m-variant) only
        return None
    witver, prog5 = vals[0], vals[1:-6]
    if witver != 0:
        return None
    acc = bits = 0
    out = bytearray()
    for v in prog5:
        acc = (acc << 5) | v
        bits += 5
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    if bits >= 5 or (acc & ((1 << bits) - 1)):
        return None
    return bytes(out) if len(out) == 20 else None


def addr_to_hash160(addr: str) -> str | None:
    addr = addr.strip()
    if not addr:
        return None
    if addr[0] in "13mn2":  # base58 mainnet/testnet p2pkh/p2sh
        payload = b58check_decode(addr)
        if payload and len(payload) == 21:
            return payload[1:].hex()
        return None
    if addr.lower().startswith(("bc1", "tb1")):
        h = bech32_decode(addr)
        return h.hex() if h else None
    return None


def main() -> int:
    src = sys.argv[1:] if len(sys.argv) > 1 else sys.stdin
    for line in src:
        h = addr_to_hash160(line)
        if h:
            print(h)
    return 0


if __name__ == "__main__":
    sys.exit(main())
