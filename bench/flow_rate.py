"""Streamed flow-serving rate (round 5): the single-dispatch window round
vs the old per-chunk dispatch loop vs the AC DFA stream, on the real chip
through the tunnel.

VERDICT r4 weak #2: flow streaming ran at XLA `window_stream_chunk` rate
with a ~30 ms dispatch round-trip PER width-chunk, ~3 orders below the
13.7 GB/s one-shot flow scan.  Round 5 collapses each scan round to ONE
dispatch (Pallas halo kernel on accelerators) with device-side count
accumulation across rounds.  This bench measures all three shapes on one
synthetic flow workload and prints a JSON line; the ledger records the
ratio.

    python bench/flow_rate.py            # TPU; compiles on first run
"""

import json
import os
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multithreading_string_matching_tpu import Matcher, load_patterns
    from multithreading_string_matching_tpu.io.pcap import read_pcap, slice_pcap
    from multithreading_string_matching_tpu.io.synth import (
        synth_tcp_flows_pcap,
    )
    from multithreading_string_matching_tpu.parallel.flow_stream import (
        FlowStreamMatcher,
    )

    import jax.numpy as jnp

    ref = os.environ.get("REFERENCE_DIR", "/root/reference")
    patterns = load_patterns(f"{ref}/strings.txt")
    m = Matcher(patterns)
    np.asarray(jnp.zeros((8,), jnp.int32) + 1)  # untimed backend warmup

    rng = np.random.default_rng(3)
    n_flows = int(os.environ.get("MSM_FLOW_BENCH_FLOWS", "192"))
    stream_len = int(os.environ.get("MSM_FLOW_BENCH_LEN", "131072"))
    flows = []
    for i in range(n_flows):
        pay = rng.integers(0x20, 0x7F, size=stream_len, dtype=np.uint8)
        for _ in range(8):  # plant fixture patterns
            p = patterns[int(rng.integers(0, len(patterns)))]
            off = int(rng.integers(0, stream_len - len(p)))
            pay[off : off + len(p)] = np.frombuffer(p, np.uint8)
        flows.append((
            (f"10.{i // 250}.{i % 250}.1", "10.255.0.1", 1024 + i, 80),
            pay.tobytes(),
            [1400] * (-(-stream_len // 1400)),
        ))
    with tempfile.TemporaryDirectory() as d:
        pcap_path = os.path.join(d, "flows.pcap")
        total = synth_tcp_flows_pcap(pcap_path, flows, interleave_seed=1)
        pcap = read_pcap(pcap_path)

        def run(engine, budget=None, label=""):
            old = FlowStreamMatcher.ROUND_BUDGET_BYTES
            if budget is not None:
                FlowStreamMatcher.ROUND_BUDGET_BYTES = budget
            try:
                # Warm/compile pass over the WHOLE capture with the same
                # feed geometry as the timed pass: round shapes depend on
                # pending-per-flow, and a warmup that rounds differently
                # leaves the timed pass paying a remote compile mid-window.
                fs = FlowStreamMatcher(m, "tcp", engine=engine)
                for s in range(0, pcap.num_packets, 8192):
                    fs.feed_pcap_slice(
                        slice_pcap(pcap, s, s + 8192, copy=False)
                    )
                fs.flush()
                fs.counts()
                fs = FlowStreamMatcher(m, "tcp", engine=engine)
                t0 = time.perf_counter()
                for s in range(0, pcap.num_packets, 8192):
                    fs.feed_pcap_slice(
                        slice_pcap(pcap, s, s + 8192, copy=False)
                    )
                fs.flush()
                counts = fs.counts()
                wall = time.perf_counter() - t0
            finally:
                FlowStreamMatcher.ROUND_BUDGET_BYTES = old
            return fs.bytes_seen / wall, counts, wall

        results = {}

        # Link probe (same shape as bench.py's): the streamed numbers below
        # are h2d-bound through the tunnel, so they must ship next to the
        # link rate they are expected to track.
        def probe_link(seed):
            prng = np.random.default_rng(seed)
            bufs = [prng.integers(0, 255, size=(4096, 2048), dtype=np.uint8)
                    for _ in range(4)]
            np.asarray(jnp.asarray(bufs.pop())[:1, :1])
            t0 = time.perf_counter()
            staged = [jnp.asarray(b) for b in bufs]
            for dv in staged:
                np.asarray(dv[:1, :1])
            return sum(b.nbytes for b in bufs) / (time.perf_counter() - t0)

        results["h2d_link_bytes_per_sec"] = round(probe_link(5), 1)

        # Device-resident round rate: ONE representative sub-lane round
        # tile staged once, the halo kernel chained data-dependently inside
        # one executable (the same honesty rule as bench.py — per-dispatch
        # round-trips and dedup would otherwise make it fiction).  This is
        # the rate flow serving runs at when the bytes are already on the
        # device (local PCIe/HBM deployments), vs the tunnel-bound e2e.
        # scan_bytes past the feed so pending ACCUMULATES (a default-sized
        # stream would scan-and-clear inside the feed).
        fs0 = FlowStreamMatcher(m, "tcp", engine="window",
                                scan_bytes=1 << 62)
        fs0.feed_pcap_slice(slice_pcap(pcap, 0, 8192, copy=False))
        flows_l = [k for k, b in fs0._pending.items() if b]
        F0 = max(8, 1 << (len(flows_l) - 1).bit_length())
        lens0 = np.zeros(F0, np.int64)
        W0 = max(len(fs0._pending[k]) for k in flows_l)
        W0 = max(fs0.width, 1 << max(0, (W0 - 1).bit_length()))
        buf0 = np.zeros((F0, W0), np.uint8)
        for i, k in enumerate(flows_l):
            b = bytes(fs0._pending[k])
            buf0[i, : len(b)] = np.frombuffer(b, np.uint8)
            lens0[i] = len(b)
        halo0 = np.zeros((F0, m.pallas.halo_width), np.uint8)
        fill0 = np.zeros(F0, np.int32)
        x2, eff2, ms2 = fs0._expand_round_lanes(
            buf0, lens0.astype(np.int32), halo0, fill0, fs0.width
        )
        pm = m.pallas
        xd = jnp.asarray(x2)
        ed = jnp.asarray(eff2)
        md = jnp.asarray(ms2)
        REPS = 200
        import jax as _jax

        @_jax.jit
        def chained():
            def body(_, tot):
                dep = jnp.minimum(tot.sum(), 0).astype(jnp.int32)
                return tot + pm._halo_run(xd, ed + dep, md)
            return _jax.lax.fori_loop(
                0, REPS, body,
                jnp.zeros((pm.num_unique,), jnp.int32),
            )

        once = np.asarray(pm.count_tile_halo(x2, eff2, ms2))
        out = np.asarray(chained())
        assert (out == once * REPS).all()
        t0 = time.perf_counter()
        np.asarray(chained())
        resident_bps = (
            int(lens0.sum()) / ((time.perf_counter() - t0) / REPS)
        )
        results["resident_round_bytes_per_sec"] = round(resident_bps, 1)

        new_bps, counts_new, wall_new = run("window")
        results["window_single_dispatch_bytes_per_sec"] = round(new_bps, 1)
        old_bps, counts_old, _ = run("window", budget=1)
        results["window_chunk_loop_bytes_per_sec"] = round(old_bps, 1)
        ac_bps, counts_ac, _ = run("ac")
        results["ac_bytes_per_sec"] = round(ac_bps, 1)
        results["h2d_link_bytes_per_sec_post"] = round(probe_link(13), 1)
        assert counts_new.tolist() == counts_old.tolist() == counts_ac.tolist()
        # Host-only feed probe: the per-packet python feed loop without any
        # scanning (scan_bytes past the corpus) — the host-side ceiling the
        # device path is measured against.
        fs = FlowStreamMatcher(m, "tcp", engine="ac", scan_bytes=1 << 62)
        t0 = time.perf_counter()
        for s in range(0, pcap.num_packets, 8192):
            fs.feed_pcap_slice(slice_pcap(pcap, s, s + 8192, copy=False))
        host_bps = fs.bytes_seen / (time.perf_counter() - t0)
        results["host_feed_only_bytes_per_sec"] = round(host_bps, 1)
        print(json.dumps({
            "metric": "flow_stream_bytes_per_sec",
            "value": results["window_single_dispatch_bytes_per_sec"],
            "unit": "bytes/s",
            "vs_chunk_loop": round(new_bps / old_bps, 2),
            "stream_bytes": total,
            "flows": n_flows,
            "device": str(jax.devices()[0]),
            "total_matches": int(np.asarray(counts_new).sum()),
            **results,
        }))


if __name__ == "__main__":
    main()
