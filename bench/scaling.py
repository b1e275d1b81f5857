"""Weak-scaling harness: sharded scan time vs mesh size, constant work/device.

BASELINE.json's north star asks for bytes/s scaling efficiency at 1 chip,
1 host, and N>=2 hosts.  This is the measurement command for it: per-device
work is held constant while the mesh grows, so on real hardware perfect weak
scaling is flat time and efficiency = t(1)/t(n).

Without attached multi-chip hardware it runs on a virtual CPU mesh (the
same ``xla_force_host_platform_device_count`` trick the tests and the
driver's ``dryrun_multichip`` use — SURVEY.md §4's Vagrant analogue).
IMPORTANT HONESTY NOTE: virtual devices all share ONE host's cores, so the
times grow roughly linearly with mesh size by construction — the CPU run
validates the harness and that sharded counts stay bit-identical at every
mesh size; the efficiency number is only meaningful when the same command
runs on a real slice.  The output labels itself accordingly.

    MSM_SCALING_DEVICES=8 python bench/scaling.py
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

N_DEV = int(os.environ.get("MSM_SCALING_DEVICES", "8"))
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={N_DEV} "
    + os.environ.get("XLA_FLAGS", "")
)

import numpy as np  # noqa: E402


def main():
    import jax

    # Prefer real multi-device hardware; fall back to the forced-count
    # virtual CPU mesh only when fewer than two real devices are attached.
    devices = jax.devices()
    if len(devices) < 2 or devices[0].platform == "cpu":
        devices = jax.devices("cpu")
    from multithreading_string_matching_tpu import (
        Matcher,
        extract_payloads,
        load_patterns,
        read_pcap,
    )
    from multithreading_string_matching_tpu.parallel.mesh import (
        count_matches_sharded,
        make_mesh,
    )

    ref = os.environ.get("REFERENCE_DIR", "/root/reference")
    matcher = Matcher(load_patterns(f"{ref}/strings.txt"))
    base = extract_payloads(
        read_pcap(f"{ref}/very_big_udp.pcap"), "udp", pad_n_to=128, pad_len_to=8
    )
    per_dev_rows = 2048  # constant per-device work (weak scaling)
    reps = int(os.environ.get("MSM_SCALING_REPS", "5"))

    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= len(devices)]
    results = {}
    for n in sizes:
        rows = per_dev_rows * n
        idx = np.resize(np.arange(base.num_payloads), rows)
        payloads = base.payloads[idx]
        lengths = base.lengths[idx]
        mesh = make_mesh(devices[:n])
        run = lambda: np.asarray(
            count_matches_sharded(
                matcher.cac, payloads, lengths, mesh,
                dup_map=matcher.window.dup_map,
                engine="window", window=matcher.window,
            )
        )
        counts = run()  # compile + correctness anchor
        single = matcher.count(payloads, lengths, engine="window")
        assert (counts == np.asarray(single)).all(), f"mesh={n} diverges"
        t0 = time.perf_counter()
        for _ in range(reps):
            run()
        dt = (time.perf_counter() - t0) / reps
        results[n] = dt
        print(json.dumps({
            "devices": n,
            "rows": rows,
            "payload_bytes": int(lengths.sum()),
            "time_s": round(dt, 4),
            "bytes_per_sec": round(int(lengths.sum()) / dt, 1),
        }))
    t1 = results[sizes[0]]
    virtual = devices[0].platform == "cpu"
    summary = {
        "metric": "weak_scaling_efficiency",
        "per_device_rows": per_dev_rows,
        "efficiency": {n: round(t1 / results[n], 3) for n in sizes},
        "counts_bit_identical_across_meshes": True,
        "hardware": "VIRTUAL cpu mesh — one shared host, efficiency not "
                    "meaningful; rerun on a real slice for the true number"
        if virtual
        else str(jax.devices()[0]),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
