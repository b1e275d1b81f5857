"""Pure-Python oracle: THE executable spec of the reference's semantics.

Independent of the framework's numpy/JAX code paths — deliberately written
as straightforward per-packet Python so conformance tests compare two
implementations that share nothing but the spec:

- payload extraction replicates packet_dumping.h:87-139 (UDP) and :150-188
  (TCP) byte-for-byte, including the quirks (no ihl>=5 check for UDP, no
  protocol/ethertype check for TCP, sizeof-pointer 8-byte UDP header skip);
- counting is the explicit-length reading (variant A, BASELINE.md) of
  kmp_matcher's overlapping-occurrence semantics: for each pattern, the
  number of positions where it ends inside the payload's true byte range.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple


def parse_pcap(path) -> List[Tuple[bytes, int]]:
    """[(captured_bytes, orig_len)] for each record in a classic pcap file."""
    with open(path, "rb") as f:
        raw = f.read()
    magic = struct.unpack("<I", raw[:4])[0]
    if magic in (0xA1B2C3D4, 0xA1B23C4D):
        endian = "<"
    elif magic in (0xD4C3B2A1, 0x4D3CB2A1):
        endian = ">"
    else:
        raise ValueError("not classic pcap")
    out = []
    pos = 24
    while pos + 16 <= len(raw):
        _, _, incl, orig = struct.unpack_from(endian + "IIII", raw, pos)
        pos += 16
        out.append((raw[pos : pos + incl], orig))
        pos += incl
    return out


def extract_udp(pkt: bytes, L: int) -> Optional[bytes]:
    """packet_dumping.h:87-139 with explicit lengths (L = header->len)."""
    if L < 14:
        return None
    if L - 14 < 20:
        return None
    if len(pkt) < 15:
        return None  # cannot read IHL (C reads heap garbage: UB; spec=invalid)
    iplen = (pkt[14] & 0x0F) * 4
    if L - 14 < iplen:
        return None
    if len(pkt) < 24:
        return None
    if pkt[14 + 9] != 17:  # IPPROTO_UDP
        return None
    if L - 14 - iplen < 8:
        return None
    off = 14 + iplen + 8
    plen = L - off
    return pkt[off : off + plen]


def extract_tcp(pkt: bytes, L: int) -> Optional[bytes]:
    """packet_dumping.h:150-188 with explicit lengths; no protocol check."""
    if len(pkt) < 15:
        return None
    size_ip = (pkt[14] & 0x0F) * 4
    if size_ip < 20:
        return None
    thoff_idx = 14 + size_ip + 12
    if len(pkt) < thoff_idx + 1:
        return None
    size_tcp = (pkt[thoff_idx] >> 4) * 4
    if size_tcp < 20:
        return None
    off = 14 + size_ip + size_tcp
    if L - off < 0:
        return None  # C would wrap unsigned; spec=invalid
    return pkt[off : off + (L - off)]


def extract_payloads(path, mode: str = "udp") -> List[bytes]:
    ext = extract_udp if mode == "udp" else extract_tcp
    out = []
    for pkt, orig in parse_pcap(path):
        p = ext(pkt, orig)
        if p is not None:
            out.append(p)
    return out


def count_overlapping(text: bytes, pattern: bytes) -> int:
    """Number of positions where pattern ends in text (overlaps counted)."""
    if len(pattern) == 0 or len(text) < len(pattern):
        return 0
    count = 0
    start = 0
    while True:
        i = text.find(pattern, start)
        if i < 0:
            return count
        count += 1
        start = i + 1


def oracle_counts(payloads: Sequence[bytes], patterns: Sequence[bytes]) -> List[int]:
    return [sum(count_overlapping(t, p) for t in payloads) for p in patterns]


def oracle_pcap_counts(pcap_path, patterns, mode: str = "udp") -> List[int]:
    return oracle_counts(extract_payloads(pcap_path, mode), patterns)
