"""Multi-PROCESS streamed-distributed bench — the measurable piece of the
weak-scaling north star (VERDICT r5 item 8).

BASELINE.json asks for >=90% weak scaling at N>=2 HOSTS; that needs a real
pod and stays hardware-gated (README/DESIGN carry it as open).  What IS
measurable on this box: N separate OS processes with a real coordinator
running `count_pcap_streamed_distributed` — per-process host pipeline rate,
end-of-run collective overhead, and count identity vs the single process.

HONESTY: all processes share this one host's cores, so the per-process rate
DROPS as N grows by construction (core contention, not framework overhead);
the numbers that transfer to real multi-host deployments are the COLLECTIVE
overhead (three end-of-run collectives regardless of capture size) and the
bit-identical counts.  The artifact labels every number accordingly.

    python bench/distributed_scaling.py          # writes the JSON artifact
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORKER = r"""
import json, os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
coord, nprocs, rank, pcap, out = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
)
if nprocs > 1:
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=rank
    )
from multithreading_string_matching_tpu import Matcher, load_patterns
from multithreading_string_matching_tpu.parallel.distributed import (
    count_pcap_streamed_distributed,
)

ref = os.environ.get("REFERENCE_DIR", "/root/reference")
m = Matcher(load_patterns(ref + "/strings.txt"))
t0 = time.perf_counter()
res = count_pcap_streamed_distributed(m, pcap, "udp")
wall = time.perf_counter() - t0
with open(out + f".rank{rank}", "w") as f:
    json.dump({
        "rank": rank,
        "wall_s": wall,
        "elapsed_max_s": res.elapsed_max_s,
        "local_payload_bytes": res.local_payload_bytes,
        "counts_sum": int(res.counts.sum()),
    }, f)
"""


def run_group(nprocs: int, pcap: str, tmp: str, port: int):
    out = os.path.join(tmp, f"out{nprocs}")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, f"127.0.0.1:{port}", str(nprocs),
             str(r), pcap, out],
            env={**os.environ, "MSM_NO_COLOR": "1"},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for r in range(nprocs)
    ]
    for p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, err.decode()[-2000:]
    ranks = []
    for r in range(nprocs):
        with open(out + f".rank{r}") as f:
            ranks.append(json.load(f))
    return ranks


def main():
    from multithreading_string_matching_tpu.io.synth import synth_udp_pcap
    from multithreading_string_matching_tpu.io.patterns import load_patterns

    ref = os.environ.get("REFERENCE_DIR", "/root/reference")
    patterns = load_patterns(f"{ref}/strings.txt")
    with tempfile.TemporaryDirectory() as tmp:
        pcap = os.path.join(tmp, "corpus.pcap")
        total_payload = synth_udp_pcap(
            pcap, 30_000, payload_len=1024, payload_len_jitter=256,
            patterns=patterns, plant_rate=0.05, seed=9,
        )
        results = {}
        t0 = time.time()
        for nprocs, port in ((1, 19731), (2, 19732), (4, 19734)):
            ranks = run_group(nprocs, pcap, tmp, port)
            # EVERY rank holds the merged counts after the collective —
            # the identity check must span all of them, not compare rank 0
            # with itself.
            assert len({r["counts_sum"] for r in ranks}) == 1, ranks
            # Collective overhead: each rank's wall minus its own local
            # scan time is coordinator startup + the three end-of-run
            # collectives (error flag, int64 merge, MAX-elapsed).
            locals_s = [r["elapsed_max_s"] for r in ranks]  # max'd already
            walls = [r["wall_s"] for r in ranks]
            per_rank_bytes = [r["local_payload_bytes"] for r in ranks]
            results[f"procs_{nprocs}"] = {
                "counts_sum": ranks[0]["counts_sum"],
                "max_elapsed_s": round(max(locals_s), 3),
                "max_wall_s": round(max(walls), 3),
                "collective_overhead_s": round(
                    max(walls) - max(locals_s), 3
                ),
                "per_rank_payload_bytes": per_rank_bytes,
                "aggregate_bytes_per_sec": round(
                    total_payload / max(locals_s), 1
                ),
            }
        counts = {k: v["counts_sum"] for k, v in results.items()}
        assert len(set(counts.values())) == 1, counts
        artifact = {
            "metric": "distributed_streamed_scaling",
            "label": (
                "N OS processes on ONE shared-core CPU host (real "
                "coordinator + collectives); transfers to multi-host: "
                "collective_overhead_s and count identity.  Per-process "
                "rate contention is this box's core sharing, NOT framework "
                "overhead — >=90% weak scaling at N>=2 real hosts remains "
                "hardware-gated (README)."
            ),
            "corpus_payload_bytes": total_payload,
            "counts_identical_across_group_sizes": True,
            "wall_total_s": round(time.time() - t0, 1),
            **results,
        }
        out_path = REPO / "DISTRIBUTED_SCALING_r05.json"
        out_path.write_text(json.dumps(artifact, indent=1))
        print(json.dumps(artifact))


if __name__ == "__main__":
    main()
