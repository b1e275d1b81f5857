"""High-level matcher API — the unified library the reference never had.

The reference is five standalone C programs sharing copy-pasted code
(SURVEY.md §1: kmp_prefix/kmp_matcher appear five times verbatim).  Here a
single :class:`Matcher` object owns the compiled automata and exposes every
execution mode as a method; the five reference programs become thin CLI
configurations over it (cli.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Union
import os

import jax
import jax.numpy as jnp
import numpy as np

from multithreading_string_matching_tpu.io.patterns import load_patterns
from multithreading_string_matching_tpu.io.pcap import read_pcap
from multithreading_string_matching_tpu.io.decode import extract_payloads, PayloadBatch
from multithreading_string_matching_tpu.models.kmp import stack_kmp_dfas
from multithreading_string_matching_tpu.models.aho_corasick import AhoCorasick
from multithreading_string_matching_tpu.ops.scan import (
    CompiledAC,
    count_matches_ac,
    count_matches_kmp,
)

# Hardware-friendly padding: lanes are 128 wide; pad the packet axis so the
# scan's [N] carry tiles cleanly, and the byte axis to the VPU sublane count.
LANE = 128
SUBLANE = 8


@dataclass
class Matcher:
    """Multi-pattern payload matcher with compiled automata.

    ``engine='ac'`` (default): one Aho-Corasick pass per byte — the TPU fast
    path.  ``engine='kmp'``: per-pattern KMP DFAs in lockstep — the
    reference-shaped conformance path.  Both produce identical counts.
    """

    patterns: List[bytes]
    engine: str = "ac"

    def __post_init__(self):
        if self.engine not in ("ac", "kmp"):
            raise ValueError(f"unknown engine {self.engine!r}")
        self.patterns = [bytes(p) for p in self.patterns]
        self.ac = AhoCorasick.build(self.patterns)
        self.cac = CompiledAC.from_automaton(self.ac)
        self._kmp_dfas, self._kmp_accept = stack_kmp_dfas(self.patterns)

    @staticmethod
    def from_file(path: Union[str, os.PathLike], engine: str = "ac") -> "Matcher":
        return Matcher(load_patterns(path), engine=engine)

    # -- core counting ----------------------------------------------------

    def count(
        self,
        payloads,
        lengths,
        *,
        per_packet: bool = False,
        engine: Optional[str] = None,
    ) -> np.ndarray:
        """Counts over the ORIGINAL pattern list (duplicates as separate entries).

        Shapes: ``int64[P]`` or ``int64[N, P]`` with ``per_packet=True``.
        """
        engine = engine or self.engine
        if engine == "kmp":
            counts = count_matches_kmp(
                self._kmp_dfas, self._kmp_accept, payloads, lengths,
                per_packet=per_packet,
            )
            return np.asarray(counts)
        counts = count_matches_ac(
            self.cac, payloads, lengths,
            per_packet=per_packet, dup_map=self.ac.dup_map,
        )
        return np.asarray(counts)

    def count_batch(self, batch: PayloadBatch, **kw) -> np.ndarray:
        return self.count(batch.payloads, batch.lengths, **kw)

    def count_pcap(
        self,
        pcap_path: Union[str, os.PathLike],
        mode: str = "udp",
        *,
        strict: bool = False,
        **kw,
    ) -> np.ndarray:
        pcap = read_pcap(pcap_path)
        batch = extract_payloads(
            pcap, mode, strict=strict, pad_n_to=LANE, pad_len_to=SUBLANE
        )
        return self.count_batch(batch, **kw)

    # -- streaming (carried DFA state across chunks) ----------------------

    def streaming_state(self, num_lanes: int) -> jax.Array:
        return jnp.zeros((num_lanes,), dtype=jnp.int32)

    def count_chunk(self, payload_chunk, rel_lengths, states):
        """Scan one chunk of a long payload stream, carrying DFA state.

        ``rel_lengths`` are payload lengths RELATIVE to this chunk's first
        column (i.e. remaining bytes).  Returns (counts[P], new_states).
        """
        counts, new_states = count_matches_ac(
            self.cac, payload_chunk, rel_lengths,
            initial_states=states, dup_map=self.ac.dup_map, return_states=True,
        )
        return np.asarray(counts), new_states
