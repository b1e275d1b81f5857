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

import socket
import time
from typing import Iterator, Optional

import numpy as np

from multithreading_string_matching_tpu.io.pcap import PcapFile, read_pcap

DEFAULT_BATCH = 10
ETH_P_ALL = 0x0003


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
    """

    def __init__(
        self,
        interface: str,
        batch_size: int = DEFAULT_BATCH,
        snaplen: int = 65535,
        timeout_s: float = 0.5,
    ):
        self.interface = interface
        self.batch_size = batch_size
        self.snaplen = snaplen
        self.timeout_s = timeout_s
        self.stopped = False
        self._sock: Optional[socket.socket] = None

    def open(self):
        self._sock = socket.socket(
            socket.AF_PACKET, socket.SOCK_RAW, socket.htons(ETH_P_ALL)
        )
        self._sock.bind((self.interface, 0))
        self._sock.settimeout(self.timeout_s)

    def close(self):
        if self._sock is not None:
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
                    yield _batch_from_packets(pending)
                    pending = []
            if pending:  # leftover partial batch on graceful stop
                yield _batch_from_packets(pending)
        finally:
            self.close()
