"""Live / streaming packet sources (component C3).

The reference opens an interface with libpcap, installs a "udp"/"tcp" BPF
filter, and pulls packets one at a time until SIGINT
(live_openmp_task.c:103-166).  Here a source is just an iterator of
:class:`PcapFile` batches feeding the same tensor pipeline:

- :class:`LiveSource` — an AF_PACKET raw socket (Linux; needs CAP_NET_RAW).
  Protocol filtering is NOT done here: the vectorized decoder already
  implements the mode predicate (the reference's BPF filter and
  dump_*_packet checks overlap — doing it once in the decoder keeps one
  code path for offline and live).
- :class:`FileReplaySource` — replays a pcap file in batches, for tests and
  offline development (the reference's own fixtures stand in for traffic).

Batch granularity defaults to 10 packets (live_openmp_task.c:142).
"""

from __future__ import annotations

import ctypes
import socket
import struct
import time
from typing import Iterator, List, Optional, Tuple

import numpy as np

from multithreading_string_matching_tpu.io.pcap import PcapFile, read_pcap

DEFAULT_BATCH = 10
ETH_P_ALL = 0x0003

# Linux socket-option constants for kernel-level capture control (values
# from <linux/filter.h> / <linux/if_packet.h>; stable ABI).
SO_ATTACH_FILTER = 26
SOL_PACKET = 263
PACKET_ADD_MEMBERSHIP = 1
PACKET_DROP_MEMBERSHIP = 2
PACKET_MR_PROMISC = 1

LINKTYPE_ETHERNET = 1
LINKTYPE_RAW = 101
# ARPHRD (if_arp.h) hardware type -> pcap linktype, libpcap's pcap-linux
# mapping for the decoder's supported linktypes: Ethernet-framed interfaces
# keep EN10MB (Linux lo included); header-less IP interfaces (ipip/sit
# tunnels, tun, wireguard's ARPHRD_NONE) are raw IP.
_LINKTYPE_BY_HATYPE = {
    1: LINKTYPE_ETHERNET,      # ARPHRD_ETHER
    772: LINKTYPE_ETHERNET,    # ARPHRD_LOOPBACK
    768: LINKTYPE_RAW,         # ARPHRD_TUNNEL (ipip)
    776: LINKTYPE_RAW,         # ARPHRD_SIT
    778: LINKTYPE_RAW,         # ARPHRD_IPGRE
    65534: LINKTYPE_RAW,       # ARPHRD_NONE (tun, wireguard)
}
# Hardware types whose frames are really Ethernet-laid-out — the only ones
# where the EN10MB cBPF filter offsets are valid.
_ETHER_HATYPES = (1, 772)

_PROTO_NUM = {"udp": 17, "tcp": 6}


def bpf_protocol_program(mode: str) -> List[Tuple[int, int, int, int]]:
    """The classic-BPF program ``pcap_compile(handle, &fp, "udp"/"tcp")``
    produces for an EN10MB link (tcpdump -dd), as (code, jt, jf, k) tuples.

    The reference installs exactly this filter in the kernel
    (live_openmp_task.c:127-136) so non-matching traffic is dropped before
    it ever crosses into userspace; :class:`LiveSource` with
    ``filter_mode=`` reproduces that.  Structure: ethertype switch at
    byte 12 — IPv6 checks the next-header byte (20) and, for fragments
    (next-header 44), the post-fragment-header byte (54); IPv4 checks the
    protocol byte (23).  Accept returns the full snap, reject returns 0.
    """
    proto = _PROTO_NUM[mode]
    return [
        (0x28, 0, 0, 12),       # ldh [12]        ethertype
        (0x15, 0, 5, 0x86DD),   # jeq IPv6  ? +1 : +6
        (0x30, 0, 0, 20),       # ldb [20]        v6 next header
        (0x15, 6, 0, proto),    # jeq proto ? accept
        (0x15, 0, 6, 44),       # jeq frag  ? +1 : reject
        (0x30, 0, 0, 54),       # ldb [54]        post-frag next header
        (0x15, 3, 4, proto),    # jeq proto ? accept : reject
        (0x15, 0, 3, 0x0800),   # jeq IPv4  ? +1 : reject
        (0x30, 0, 0, 23),       # ldb [23]        v4 protocol
        (0x15, 0, 1, proto),    # jeq proto ? +1 : reject
        (0x06, 0, 0, 0x40000),  # ret 262144      accept (full snap)
        (0x06, 0, 0, 0),        # ret 0           drop
    ]


def bpf_simulate(program, frame: bytes) -> int:
    """Reference interpreter for the cBPF subset the programs above use
    (ldh/ldb absolute, jeq, ret) — lets tests prove the filter's accept/
    reject behavior without a kernel.  Returns the snap length (0 = drop).
    Out-of-bounds loads terminate with 0, as the kernel's checker does."""
    pc, acc = 0, 0
    while pc < len(program):
        code, jt, jf, k = program[pc]
        if code == 0x28:     # ldh [k]
            if k + 2 > len(frame):
                return 0
            acc = struct.unpack_from(">H", frame, k)[0]
        elif code == 0x30:   # ldb [k]
            if k >= len(frame):
                return 0
            acc = frame[k]
        elif code == 0x15:   # jeq #k, jt, jf
            pc += jt if acc == k else jf
        elif code == 0x06:   # ret #k
            return k
        else:  # pragma: no cover - programs above use no other opcodes
            raise ValueError(f"unsupported cBPF opcode {code:#x}")
        pc += 1
    raise ValueError("cBPF program fell off the end")


def _attach_kernel_filter(sock: socket.socket, mode: str) -> None:
    """setsockopt(SO_ATTACH_FILTER) with the classic-BPF protocol program —
    struct sock_fprog is (u16 len, pad, struct sock_filter *)."""
    prog = bpf_protocol_program(mode)
    blob = b"".join(struct.pack("HBBI", *insn) for insn in prog)
    buf = ctypes.create_string_buffer(blob, len(blob))
    fprog = struct.pack("HL", len(prog), ctypes.addressof(buf))
    # The kernel copies the program during setsockopt; buf only needs to
    # outlive this call (it does — local scope).
    sock.setsockopt(socket.SOL_SOCKET, SO_ATTACH_FILTER, fprog)


def _batch_from_packets(packets, linktype=1) -> PcapFile:
    """Wrap a list of raw packet byte strings as an in-memory PcapFile."""
    if packets:
        buf = np.frombuffer(b"".join(packets), dtype=np.uint8).copy()
        lens = np.array([len(p) for p in packets], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    else:
        buf = np.zeros(0, dtype=np.uint8)
        lens = np.zeros(0, dtype=np.int64)
        offsets = np.zeros(0, dtype=np.int64)
    now = int(time.time())
    return PcapFile(
        buf=buf,
        offsets=offsets,
        caplens=lens,
        origlens=lens.copy(),
        ts_sec=np.full(len(packets), now, dtype=np.int64),
        ts_frac=np.zeros(len(packets), dtype=np.int64),
        linktype=linktype,
        snaplen=65535,
        nanos=False,
    )


class FileReplaySource:
    """Replay a pcap file as batches of whole packets."""

    def __init__(self, path, batch_size: int = DEFAULT_BATCH):
        self.pcap = read_pcap(path)
        self.batch_size = batch_size

    def __iter__(self) -> Iterator[PcapFile]:
        pc = self.pcap
        for start in range(0, pc.num_packets, self.batch_size):
            stop = min(start + self.batch_size, pc.num_packets)
            yield PcapFile(
                buf=pc.buf,
                offsets=pc.offsets[start:stop],
                caplens=pc.caplens[start:stop],
                origlens=pc.origlens[start:stop],
                ts_sec=pc.ts_sec[start:stop],
                ts_frac=pc.ts_frac[start:stop],
                linktype=pc.linktype,
                snaplen=pc.snaplen,
                nanos=pc.nanos,
            )


class LiveSource:
    """Capture from a network interface via an AF_PACKET raw socket.

    Yields batches of ``batch_size`` packets; a receive timeout lets the
    caller's stop flag (SIGINT) be observed between packets, mirroring the
    reference's pcap_next loop + signalFlag (live_openmp_task.c:164-166).
    A partial batch is yielded on stop — the reference's leftover-drain
    (live_openmp_task.c:222-225).

    ``filter_mode='udp'|'tcp'`` installs the classic-BPF protocol program
    IN THE KERNEL (SO_ATTACH_FILTER) — non-matching traffic is dropped
    before the userspace recv loop ever sees it, exactly the reference's
    pcap_compile/pcap_setfilter (live_openmp_task.c:127-136).  Frames that
    raced onto the socket before the filter attached are drained off.

    ``promiscuous=True`` joins PACKET_MR_PROMISC on the interface (dropped
    again on close), the reference's ``pcap_open_live(..., promisc=1, ...)``
    (live_openmp_task.c:111-112) — an IDS tap on a mirror port needs it to
    see frames not addressed to this host.
    """

    def __init__(
        self,
        interface: str,
        batch_size: int = DEFAULT_BATCH,
        snaplen: int = 65535,
        timeout_s: float = 0.5,
        filter_mode: Optional[str] = None,
        promiscuous: bool = False,
    ):
        if filter_mode is not None and filter_mode not in _PROTO_NUM:
            raise ValueError(
                f"filter_mode must be one of {sorted(_PROTO_NUM)} or None, "
                f"got {filter_mode!r}"
            )
        self.interface = interface
        self.batch_size = batch_size
        self.snaplen = snaplen
        self.timeout_s = timeout_s
        self.filter_mode = filter_mode
        self.promiscuous = promiscuous
        self.stopped = False
        self.linktype = LINKTYPE_ETHERNET  # resolved from ARPHRD at open()
        self._sock: Optional[socket.socket] = None
        self._promisc_on = False

    def open(self):
        self._sock = socket.socket(
            socket.AF_PACKET, socket.SOCK_RAW, socket.htons(ETH_P_ALL)
        )
        try:
            # Order matters (libpcap's): BIND first — an unbound ETH_P_ALL
            # socket receives from EVERY interface, so anything queued
            # pre-bind could be mistaken for this interface's traffic.
            # Then filter, then drain (pre-bind strays from other
            # interfaces AND, when a filter was attached, frames that
            # raced in unfiltered post-bind), then promisc.
            self._sock.bind((self.interface, 0))
            # Map the interface's ARPHRD hardware type to the pcap linktype
            # (libpcap's pcap-linux mapping for the types we decode):
            # raw-IP interfaces (tun/wireguard/ipip/sit) carry no Ethernet
            # header — decoding them as Ethernet silently mismatches every
            # packet.  Unknown types keep the Ethernet fallback (= the
            # decoder's documented reference behavior).
            hatype = self._sock.getsockname()[3]
            self.linktype = _LINKTYPE_BY_HATYPE.get(hatype, LINKTYPE_ETHERNET)
            if self.filter_mode is not None:
                # Attach the EN10MB cBPF program only when the hardware
                # type is KNOWN Ethernet-framed: on an unknown type the
                # linktype falls back to Ethernet for DECODE (reference
                # behavior), but installing Ethernet-offset filter loads
                # there would silently drop nearly all traffic.  Skipped
                # filters run post-capture instead (bpf_protocol_mask is
                # linktype-aware; counts and 'sniffed' stay equivalent).
                if hatype in _ETHER_HATYPES:
                    _attach_kernel_filter(self._sock, self.filter_mode)
            self._sock.setblocking(False)
            try:
                while True:
                    self._sock.recv(self.snaplen)
            except (BlockingIOError, InterruptedError):
                pass
            if self.promiscuous:
                mreq = struct.pack(
                    "IHH8s", socket.if_nametoindex(self.interface),
                    PACKET_MR_PROMISC, 0, b"\x00" * 8,
                )
                self._sock.setsockopt(SOL_PACKET, PACKET_ADD_MEMBERSHIP, mreq)
                self._promisc_on = True
            self._sock.settimeout(self.timeout_s)
        except BaseException:
            self._sock.close()
            self._sock = None
            raise

    def close(self):
        if self._sock is not None:
            if self._promisc_on:
                try:
                    mreq = struct.pack(
                        "IHH8s", socket.if_nametoindex(self.interface),
                        PACKET_MR_PROMISC, 0, b"\x00" * 8,
                    )
                    self._sock.setsockopt(
                        SOL_PACKET, PACKET_DROP_MEMBERSHIP, mreq
                    )
                except OSError:
                    pass  # interface went away; kernel drops it with the fd
                self._promisc_on = False
            self._sock.close()
            self._sock = None

    def __enter__(self) -> "LiveSource":
        self.open()
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def stop(self):
        self.stopped = True

    def __iter__(self) -> Iterator[PcapFile]:
        if self._sock is None:
            self.open()
        pending = []
        try:
            while not self.stopped:
                try:
                    pkt = self._sock.recv(self.snaplen)
                except socket.timeout:
                    continue
                pending.append(pkt)
                if len(pending) >= self.batch_size:
                    yield _batch_from_packets(pending, linktype=self.linktype)
                    pending = []
            if pending:  # leftover partial batch on graceful stop
                yield _batch_from_packets(pending, linktype=self.linktype)
        finally:
            self.close()
