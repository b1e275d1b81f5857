"""Engine comparison on one corpus — reproducible source of the README table.

Every engine is timed the honest way for remote-attached devices: N
data-dependent repeats chained inside ONE executable, one fetch (see
docs/DESIGN.md §7).  Repeat counts are scaled per engine so each timed
window is ~0.1-1 s.

Run:  python bench/engines.py [pcap] [strings]
"""

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

REF = pathlib.Path("/root/reference")


def chained(make_out, reps):
    """jit a fori_loop whose body re-runs make_out(dep) with a value-0 scalar
    derived from the running total — every pass depends on the previous one,
    so none can be elided or deduplicated."""

    zero = make_out(jnp.int32(0))

    @jax.jit
    def run():
        def body(_, total):
            dep = jnp.minimum(total.sum(), 0).astype(jnp.int32)
            return total + make_out(dep)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(zero))

    out = np.asarray(run())  # compile + warm
    t0 = time.perf_counter()
    out = np.asarray(run())
    dt = (time.perf_counter() - t0) / reps
    return out, dt


def main():
    from multithreading_string_matching_tpu import (
        Matcher, extract_payloads, load_patterns, read_pcap,
    )
    from multithreading_string_matching_tpu.ops.window import count_matches_window
    from multithreading_string_matching_tpu.ops.scan import (
        count_matches_ac, count_matches_kmp,
    )

    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    pcap = sys.argv[1] if len(sys.argv) > 1 else str(REF / "very_big_udp.pcap")
    strings = sys.argv[2] if len(sys.argv) > 2 else str(REF / "strings.txt")
    m = Matcher(load_patterns(strings))
    batch = extract_payloads(read_pcap(pcap), "udp")
    nbytes = batch.total_payload_bytes
    prep = m.prepare_batch(batch, packed="auto")  # the bench.py staging
    payloads = jnp.asarray(batch.payloads, jnp.uint8)
    lengths = jnp.asarray(batch.lengths, jnp.int32)
    want = m.count_batch(batch)

    results = {}

    # pallas: the production dispatcher's own chained-repeat path
    r = 1000
    rep = np.asarray(m.pallas.count_tiles_repeated(prep.tiles, r))
    t0 = time.perf_counter()
    rep = np.asarray(m.pallas.count_tiles_repeated(prep.tiles, r))
    dt = (time.perf_counter() - t0) / r
    assert (rep[m.window.dup_map] == want * r).all()
    results["pallas"] = dt

    wp = m.window

    out, dt = chained(
        lambda dep: count_matches_window(wp, payloads, lengths + dep), 100
    )
    assert (out == want * 100).all()
    results["window"] = dt

    out, dt = chained(
        lambda dep: count_matches_ac(
            m.cac, payloads, lengths + dep, dup_map=m.ac.dup_map
        ),
        5,
    )
    assert (out == want * 5).all()
    results["ac"] = dt

    out, dt = chained(
        lambda dep: count_matches_kmp(
            m._kmp_dfas, m._kmp_accept, payloads, lengths + dep
        ),
        3,
    )
    assert (out == want * 3).all()
    results["kmp"] = dt

    for name, dt in results.items():
        print(json.dumps({
            "engine": name,
            "scan_time_s": round(dt, 6),
            "bytes_per_sec": round(nbytes / dt, 1),
            "corpus": pathlib.Path(pcap).name,
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    main()
