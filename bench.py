"""Benchmark: multi-pattern payload scan throughput per chip.

Prints ONE JSON line:
  {"metric": "payload_bytes_per_sec_per_chip", "value": N, "unit": "bytes/s",
   "vs_baseline": N / cpu_serial_bytes_per_sec, ...}

Workload: the biggest bundled corpus (very_big_udp.pcap unless overridden via
MSM_BENCH_PCAP), all 97 strings.txt patterns — BASELINE.json configs[2/3]
shape.  The device kernel is the Aho-Corasick lax.scan path.

``vs_baseline`` compares against the reference's serial design point: a
-O2-compiled C KMP loop (per-pattern, per-payload — serial.c's hot-loop
structure, our own implementation in native/serial_baseline.c) over the
identical extracted payload bytes on this machine's CPU.  The reference
publishes no numbers (BASELINE.md), so this measured serial-C throughput is
the baseline.
"""

import json
import os
import pathlib
import struct
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).parent
REF = pathlib.Path(os.environ.get("REFERENCE_DIR", "/root/reference"))
PCAP = pathlib.Path(os.environ.get("MSM_BENCH_PCAP", REF / "very_big_udp.pcap"))
STRINGS = pathlib.Path(os.environ.get("MSM_STRINGS", REF / "strings.txt"))
REPS = int(os.environ.get("MSM_BENCH_REPS", "20"))


def cpu_serial_baseline(payload_list, patterns) -> float:
    """bytes/s of the C serial KMP loop on this machine (cached per corpus)."""
    src = REPO / "multithreading_string_matching_tpu" / "native" / "serial_baseline.c"
    exe = pathlib.Path("/tmp/msm_serial_baseline")
    if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["gcc", "-O2", "-o", str(exe), str(src)], check=True, capture_output=True
        )
    dump = pathlib.Path("/tmp/msm_bench_payloads.bin")
    blob = b"".join(payload_list)
    with open(dump, "wb") as f:
        f.write(struct.pack("<qqq", len(payload_list), len(blob), len(patterns)))
        f.write(np.array([len(p) for p in payload_list], dtype="<i4").tobytes())
        f.write(blob)
        f.write(np.array([len(p) for p in patterns], dtype="<i4").tobytes())
        f.write(b"".join(patterns))
    out = subprocess.run(
        [str(exe), str(dump)], check=True, capture_output=True, text=True
    ).stdout.split()
    elapsed, total_matches, nbytes = float(out[0]), int(out[1]), int(out[2])
    return nbytes / elapsed, total_matches


def main():
    from multithreading_string_matching_tpu import (
        Matcher,
        extract_payloads,
        load_patterns,
        read_pcap,
    )
    from multithreading_string_matching_tpu.ops.scan import count_matches_ac
    import jax
    import jax.numpy as jnp

    patterns = load_patterns(STRINGS)
    matcher = Matcher(patterns)
    pcap = read_pcap(PCAP)
    batch = extract_payloads(pcap, "udp", pad_n_to=1024, pad_len_to=128)
    payload_bytes = batch.total_payload_bytes

    payloads = jnp.asarray(batch.payloads)
    lengths = jnp.asarray(batch.lengths)

    def run():
        return count_matches_ac(
            matcher.cac, payloads, lengths, dup_map=matcher.ac.dup_map
        )

    counts = np.asarray(run())  # compile + correctness anchor

    # Timed region: device scan only (steady-state serving shape).
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = run()
    np.asarray(out)
    elapsed = (time.perf_counter() - t0) / REPS
    tpu_bps = payload_bytes / elapsed

    valid = batch.lengths > 0
    payload_list = [
        batch.payloads[i, : batch.lengths[i]].tobytes()
        for i in range(batch.num_payloads)
        if batch.lengths[i] > 0
    ]
    cpu_bps, cpu_matches = cpu_serial_baseline(payload_list, patterns)
    assert cpu_matches == int(counts.sum()), (cpu_matches, int(counts.sum()))

    print(
        json.dumps(
            {
                "metric": "payload_bytes_per_sec_per_chip",
                "value": round(tpu_bps, 1),
                "unit": "bytes/s",
                "vs_baseline": round(tpu_bps / cpu_bps, 3),
                "baseline_cpu_serial_bytes_per_sec": round(cpu_bps, 1),
                "corpus": PCAP.name,
                "payload_bytes": payload_bytes,
                "packets": int(batch.num_packets),
                "patterns": len(patterns),
                "total_matches": int(counts.sum()),
                "device": str(jax.devices()[0]),
                "scan_time_s": round(elapsed, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
