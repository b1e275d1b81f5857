"""Flow-round sub-lane WIDTH sweep on the device-resident halo kernel.

The single-dispatch flow round re-lays pending bytes as fixed-width
sub-lanes (flow_stream._expand_round_lanes) and scans them through
`count_tile_halo`.  Width sets the halo-overhead fraction
(H/(H+W): ~11% at 2048 with the fixture's H=255, ~3% at 8192) against
row-parallelism and VMEM tiling.  This sweeps the width on the same
workload bench/flow_rate.py measures (192 flows, 8192-packet round,
1400-byte segments) and prints one JSON line of resident rates —
the input to choosing FlowStreamMatcher.width's default.

    python bench/flow_width_sweep.py    # TPU; one remote compile per width
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
    import jax.numpy as jnp

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
        for _ in range(8):
            p = patterns[int(rng.integers(0, len(patterns)))]
            off = int(rng.integers(0, stream_len - len(p)))
            pay[off : off + len(p)] = np.frombuffer(p, np.uint8)
        flows.append((
            (f"10.{i // 250}.{i % 250}.1", "10.255.0.1", 1024 + i, 80),
            pay.tobytes(),
            [1400] * (-(-stream_len // 1400)),
        ))
    widths = [int(w) for w in os.environ.get(
        "MSM_FLOW_WIDTHS", "1024,2048,4096,8192"
    ).split(",")]
    rates = {}
    with tempfile.TemporaryDirectory() as d:
        pcap_path = os.path.join(d, "flows.pcap")
        synth_tcp_flows_pcap(pcap_path, flows, interleave_seed=1)
        pcap = read_pcap(pcap_path)
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
        pm = m.pallas
        halo0 = np.zeros((F0, pm.halo_width), np.uint8)
        fill0 = np.zeros(F0, np.int32)
        want = None
        for w in widths:
            x2, eff2, ms2 = fs0._expand_round_lanes(
                buf0, lens0.astype(np.int32), halo0, fill0, w
            )
            xd, ed, md = jnp.asarray(x2), jnp.asarray(eff2), jnp.asarray(ms2)
            REPS = 200

            @jax.jit
            def chained(xd=xd, ed=ed, md=md):
                def body(_, tot):
                    dep = jnp.minimum(tot.sum(), 0).astype(jnp.int32)
                    return tot + pm._halo_run(xd, ed + dep, md)
                return jax.lax.fori_loop(
                    0, REPS, body, jnp.zeros((pm.num_unique,), jnp.int32),
                )

            once = np.asarray(pm.count_tile_halo(x2, eff2, ms2))
            if want is None:
                want = once
            assert (once == want).all(), f"width {w} changed counts"
            out = np.asarray(chained())
            assert (out == once * REPS).all()
            t0 = time.perf_counter()
            np.asarray(chained())
            rates[str(w)] = round(
                int(lens0.sum()) / ((time.perf_counter() - t0) / REPS), 1
            )
            print(f"# width {w}: {rates[str(w)] / 1e9:.3f} GB/s "
                  f"(rows {x2.shape[0]} x {x2.shape[1]})",
                  file=sys.stderr, flush=True)
    best = max(rates, key=lambda k: rates[k])
    print(json.dumps({
        "metric": "flow_round_width_sweep",
        "unit": "bytes/s",
        "device": str(jax.devices()[0]),
        "flows": n_flows,
        "round_bytes": int(lens0.sum()),
        "halo_width": int(pm.halo_width),
        "rates": rates,
        "best_width": int(best),
        "best_over_default": round(rates[best] / rates["2048"], 3)
        if "2048" in rates else None,
    }))


if __name__ == "__main__":
    main()
