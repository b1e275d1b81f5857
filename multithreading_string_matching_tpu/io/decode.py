"""Vectorized Ethernet/IPv4/UDP/TCP payload extraction (components C4, C5).

The reference extracts payloads one packet at a time with pointer-walking C
(packet_dumping.h:87-139 ``dump_UDP_packet``, :150-188 ``dump_TCP_packet``).
Here the same header arithmetic runs as vectorized numpy over ALL packets at
once: gather the few header bytes each predicate needs, evaluate the validity
predicate as boolean arrays, and materialize one padded ``uint8[N, Lmax]``
payload tensor plus an ``int32[N]`` length vector — the shape the TPU scan
kernels consume.

Replicated reference behavior (compat mode, the default):

UDP (packet_dumping.h:87-139), with L = the packet's original length
(serial.c passes header->len, :120):
  1. L >= 14                      (sizeof(struct ether_header), :94)
  2. L - 14 >= 20                 (sizeof(struct ip), :102)
  3. iplen = (byte14 & 0x0f) * 4; L - 14 >= iplen   (:108-113; note there is
     NO iplen >= 20 check — ihl < 5 slips through, replicated here)
  4. proto byte (offset 14+9) == 17 (IPPROTO_UDP, :116)
  5. L - 14 - iplen >= 8          (sizeof(struct UDP_hdr), :125)
  6. payload_off = 14 + iplen + 8; payload_len = L - payload_off
     (the reference advances by ``sizeof(udp_h)`` — sizeof a POINTER — which
     is 8 on LP64 and coincidentally equals the UDP header size, :133)

TCP (packet_dumping.h:150-188):
  1. NO initial length check and NO ip_p/ethertype check — any packet whose
     length nibbles are plausible passes (replicated; see ``strict``)
  2. size_ip = (byte14 & 0x0f) * 4 >= 20   (:165-169)
  3. size_tcp = (byte[14+size_ip+12] >> 4) * 4 >= 20   (:175-179)
  4. payload_off = 14 + size_ip + size_tcp; payload_len = L - payload_off

Defined divergences from the C code's undefined behavior (see BASELINE.md):
  - Header bytes beyond the captured data (caplen) cannot be read; such
    packets are invalid here, where the C code reads heap garbage.
  - A TCP packet with L < payload_off would wrap to a huge unsigned
    payload_len in C (then crash in memcpy); here it is invalid.
  - Payload bytes are taken from the captured data and clipped to caplen;
    payload_len itself follows the reference's origlen arithmetic.

``strict=True`` turns on the checks the reference forgot: ethertype 0x0800,
ihl >= 5 for UDP, and ip_p == IPPROTO_TCP for TCP mode.
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

from multithreading_string_matching_tpu.io.pcap import PcapFile

IPPROTO_UDP = 17
IPPROTO_TCP = 6
ETHERTYPE_IPV4 = 0x0800
ETH_HLEN = 14
UDP_HLEN = 8
MIN_IP_HLEN = 20
MIN_TCP_HLEN = 20


@dataclass(frozen=True)
class PayloadBatch:
    """Padded payload tensor + lengths: the device-facing packet representation."""

    payloads: np.ndarray      # uint8[N, Lmax] zero-padded payload bytes
    lengths: np.ndarray       # int32[N] true payload byte counts
    valid: np.ndarray         # bool[N_packets] which input packets were valid
    num_packets: int          # packets inspected (valid + invalid)

    @property
    def num_payloads(self) -> int:
        return int(self.payloads.shape[0])

    @property
    def total_payload_bytes(self) -> int:
        return int(self.lengths.sum())

    def payload(self, i: int) -> bytes:
        return self.payloads[i, : int(self.lengths[i])].tobytes()


def _safe_byte(buf: np.ndarray, idx: np.ndarray, ok: np.ndarray) -> np.ndarray:
    """Gather buf[idx] where ok, else 0 — without out-of-bounds reads."""
    clipped = np.where(ok, idx, 0)
    return np.where(ok, buf[np.minimum(clipped, buf.shape[0] - 1)], 0)


def decode_headers(
    pcap: PcapFile, mode: str, *, strict: bool = False, use_native: bool = True
):
    """Vectorized validity predicate + payload geometry for every packet.

    Returns ``(valid bool[N], payload_off int64[N], payload_len int64[N])``
    where offsets are relative to each packet's start.
    """
    if mode not in ("udp", "tcp"):
        raise ValueError(f"mode must be 'udp' or 'tcp', got {mode!r}")
    if use_native:
        from multithreading_string_matching_tpu.io import native

        if native.available():
            return native.decode(
                pcap.buf, pcap.offsets, pcap.caplens, pcap.origlens, mode, strict
            )
    buf = pcap.buf
    off = pcap.offsets
    cap = pcap.caplens
    L = pcap.origlens.astype(np.int64)

    # Byte 14 (IP version/IHL) and the protocol byte are needed by both modes.
    can_read_ihl = cap >= ETH_HLEN + 1
    vhl = _safe_byte(buf, off + ETH_HLEN, can_read_ihl).astype(np.int64)
    iplen = (vhl & 0x0F) * 4
    can_read_proto = cap >= ETH_HLEN + 10
    proto = _safe_byte(buf, off + ETH_HLEN + 9, can_read_proto).astype(np.int64)

    ethertype_ok = True
    if strict:
        can_read_et = cap >= ETH_HLEN
        et_hi = _safe_byte(buf, off + 12, can_read_et).astype(np.int64)
        et_lo = _safe_byte(buf, off + 13, can_read_et).astype(np.int64)
        ethertype_ok = ((et_hi << 8) | et_lo) == ETHERTYPE_IPV4

    if mode == "udp":
        valid = L >= ETH_HLEN                                   # check 1
        valid &= (L - ETH_HLEN) >= MIN_IP_HLEN                  # check 2
        valid &= can_read_ihl
        valid &= (L - ETH_HLEN) >= iplen                        # check 3
        valid &= can_read_proto & (proto == IPPROTO_UDP)        # check 4
        valid &= (L - ETH_HLEN - iplen) >= UDP_HLEN             # check 5
        if strict:
            valid &= (iplen >= MIN_IP_HLEN) & ethertype_ok
        payload_off = ETH_HLEN + iplen + UDP_HLEN
    else:
        valid = can_read_ihl
        valid &= iplen >= MIN_IP_HLEN                           # check 2
        thoff_idx = off + ETH_HLEN + iplen + 12
        can_read_thoff = cap >= ETH_HLEN + iplen + 13
        valid &= can_read_thoff
        thb = _safe_byte(buf, thoff_idx, valid).astype(np.int64)
        tcplen = (thb >> 4) * 4
        valid &= tcplen >= MIN_TCP_HLEN                         # check 3
        if strict:
            valid &= can_read_proto & (proto == IPPROTO_TCP) & ethertype_ok
        payload_off = ETH_HLEN + iplen + tcplen

    payload_len = L - payload_off
    valid &= payload_len >= 0     # C would wrap unsigned; we reject (see module doc)
    payload_off = np.where(valid, payload_off, 0)
    payload_len = np.where(valid, payload_len, 0)
    return valid, payload_off, payload_len


def _materialize_padded(
    buf: np.ndarray,
    starts: np.ndarray,
    lens: np.ndarray,
    pad_len_to: int,
) -> np.ndarray:
    """Scatter variable-length byte slices into a zero-padded [N, Lmax] tensor,
    fully vectorized (no per-packet Python loop)."""
    n = starts.shape[0]
    lmax = int(lens.max()) if n else 0
    lmax = max(lmax, 1)
    if pad_len_to > 1:
        lmax = -(-lmax // pad_len_to) * pad_len_to
    from multithreading_string_matching_tpu.io import native

    if native.available():
        return native.fill_padded(buf, starts, lens, lmax)
    out = np.zeros((n, lmax), dtype=np.uint8)
    total = int(lens.sum())
    if total == 0:
        return out
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    # Position within each row: global arange minus each row's starting rank.
    cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
    cols = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
    src = np.repeat(starts, lens) + cols
    out[rows, cols] = buf[src]
    return out


def extract_payloads(
    pcap: PcapFile,
    mode: str = "udp",
    *,
    strict: bool = False,
    keep_invalid: bool = False,
    pad_len_to: int = 1,
    pad_n_to: int = 1,
) -> PayloadBatch:
    """Decode + slice every packet's payload into a padded device tensor.

    ``keep_invalid=True`` keeps a zero-length row for each invalid packet
    (the openmp_data.c:143-146 placeholder semantics — its ``" "`` sentinel
    can never match because fscanf-%s patterns cannot contain whitespace, so
    a zero-length row is count-equivalent); the default drops invalid
    packets entirely (serial.c:124-140 semantics).  Both yield identical
    counts; they differ only in row bookkeeping.

    ``pad_len_to``/``pad_n_to`` round the tensor dims up to hardware-friendly
    multiples (lanes=128, sublanes) so the scan kernels see aligned tiles.
    Padding rows have length 0 and padding bytes are 0; the scan masks both.
    """
    valid, poff, plen = decode_headers(pcap, mode, strict=strict)

    # Clip payload reads to the captured bytes (never read past caplen).
    avail = np.maximum(pcap.caplens - poff, 0)
    read_len = np.minimum(plen, avail)

    if keep_invalid:
        starts = pcap.offsets + poff
        lens = np.where(valid, read_len, 0)
        logical = np.where(valid, plen, 0)
    else:
        starts = (pcap.offsets + poff)[valid]
        lens = read_len[valid]
        logical = plen[valid]

    n = starts.shape[0]
    n_padded = max(n, 1)
    if pad_n_to > 1:
        n_padded = -(-n_padded // pad_n_to) * pad_n_to
    if n_padded != n:
        starts = np.concatenate([starts, np.zeros(n_padded - n, dtype=starts.dtype)])
        lens = np.concatenate([lens, np.zeros(n_padded - n, dtype=lens.dtype)])
        logical = np.concatenate([logical, np.zeros(n_padded - n, dtype=logical.dtype)])

    payloads = _materialize_padded(pcap.buf, starts, lens, pad_len_to)
    # Lengths the scan should honor: the reference's origlen arithmetic,
    # clipped to what was actually captured (equal on all fixtures).
    lengths = np.minimum(logical, payloads.shape[1]).astype(np.int32)
    lengths = np.minimum(lengths, lens.astype(np.int32) + 0)  # never exceed real bytes
    return PayloadBatch(
        payloads=payloads,
        lengths=lengths,
        valid=valid,
        num_packets=pcap.num_packets,
    )
