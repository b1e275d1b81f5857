"""Round-5 kernels on REAL Mosaic: the flow-halo kernel and the
pattern-shard table kernel have interpret-mode coverage from the CPU suite;
this script compiles and cross-checks them on the actual TPU chip (the
Mosaic lowering rules — SMEM block shapes, roll lowerings, pl.when — only
bite on hardware).  Prints one OK line per check; any divergence asserts.

Run: python bench/round5_tpu_check.py   (TPU; ~minutes of remote compiles
on a cold cache)
"""

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multithreading_string_matching_tpu import Matcher, load_patterns
    from multithreading_string_matching_tpu.ops.window import (
        StreamHalo,
        window_stream_chunk,
    )

    import jax.numpy as jnp

    patterns = load_patterns("/root/reference/strings.txt")
    m = Matcher(patterns)
    rng = np.random.default_rng(77)

    # Warmup op (backend init is minutes cold through the tunnel).
    np.asarray(jnp.zeros((8,), jnp.int32) + 1)
    print("backend:", jax.default_backend(), flush=True)

    # 1. Flow-halo kernel vs the XLA window chunk scan.
    pm = m.pallas
    assert hasattr(pm, "count_tile_halo"), type(pm)
    H = pm.halo_width
    F, C = 256, 1024
    rel = rng.integers(0, C + 1, size=F).astype(np.int32)
    fill = rng.integers(0, H + 1, size=F).astype(np.int32)
    buf = rng.integers(0x20, 0x7F, size=(F, C)).astype(np.uint8)
    # Plant fixture patterns so real matches cross the halo boundary.
    for i in range(0, F, 3):
        p = patterns[int(rng.integers(0, len(patterns)))]
        if len(p) < C:
            off = int(rng.integers(0, C - len(p)))
            buf[i, off : off + len(p)] = np.frombuffer(p, np.uint8)
            rel[i] = max(rel[i], off + len(p))
    cols = np.arange(C)[None, :]
    buf = np.where(cols < rel[:, None], buf, 0).astype(np.uint8)
    halo = np.zeros((F, H), np.uint8)
    for i in range(F):
        if fill[i]:
            halo[i, H - fill[i]:] = rng.integers(0x20, 0x7F, size=fill[i])
    want, _ = window_stream_chunk(
        m.window, buf, rel, StreamHalo(jnp.asarray(halo), jnp.asarray(fill)),
        expand_duplicates=False,
    )
    x = np.concatenate([halo, buf], axis=1)
    eff = np.minimum(rel.astype(np.int64) + H, x.shape[1]).astype(np.int32)
    got = pm.count_tile_halo(x, eff, H - fill)
    assert (np.asarray(got) == np.asarray(want)).all(), (
        np.asarray(got)[:8], np.asarray(want)[:8]
    )
    assert int(np.asarray(got).sum()) > 0
    print("halo kernel OK:", int(np.asarray(got).sum()), "matches", flush=True)

    # 2. Pattern-shard table kernel on the 1-chip mesh (plain + filtered),
    # 97-pattern fixture and a 768-pattern uniform set.
    import os

    from multithreading_string_matching_tpu.parallel.pattern_shard import (
        count_matches_pattern_sharded,
        make_pattern_mesh,
    )

    mesh = make_pattern_mesh(jax.devices()[:1])
    payloads = rng.integers(0x20, 0x7F, size=(512, 512)).astype(np.uint8)
    lengths = rng.integers(0, 513, size=512).astype(np.int32)
    for i in range(0, 512, 4):
        p = patterns[int(rng.integers(0, len(patterns)))]
        off = int(rng.integers(0, 512 - len(p)))
        payloads[i, off : off + len(p)] = np.frombuffer(p, np.uint8)
        lengths[i] = max(lengths[i], off + len(p))
    cols = np.arange(512)[None, :]
    payloads = np.where(cols < lengths[:, None], payloads, 0).astype(np.uint8)
    want = m.count(payloads, lengths, engine="window")
    got_f = count_matches_pattern_sharded(m, payloads, lengths, mesh,
                                          engine="pallas")
    assert (np.asarray(got_f) == np.asarray(want)).all()
    os.environ["MSM_PALLAS_FILTER"] = "0"
    try:
        got_p = count_matches_pattern_sharded(m, payloads, lengths, mesh,
                                              engine="pallas")
    finally:
        del os.environ["MSM_PALLAS_FILTER"]
    assert (np.asarray(got_p) == np.asarray(want)).all()
    print("pattern-shard kernel OK (fixture):", int(np.asarray(got_f).sum()),
          flush=True)

    big = Matcher([b"rs%06d" % i for i in range(768)])
    bw = big.count(payloads, lengths, engine="window")
    bg = count_matches_pattern_sharded(big, payloads, lengths, mesh,
                                       engine="pallas")
    assert (np.asarray(bg) == np.asarray(bw)).all()
    print("pattern-shard kernel OK (768 uniform)", flush=True)

    # 3. Flow-stream window round on chip (routes through the halo kernel).
    import tempfile

    from multithreading_string_matching_tpu.io.pcap import read_pcap
    from multithreading_string_matching_tpu.io.synth import (
        synth_tcp_flows_pcap,
    )
    from multithreading_string_matching_tpu.parallel.flow_stream import (
        FlowStreamMatcher,
    )

    with tempfile.NamedTemporaryFile(suffix=".pcap") as tf:
        synth_tcp_flows_pcap(
            tf.name,
            [(("10.0.0.1", "10.0.0.2", 1111, 80), b"xxhttpyy" * 8, [5] * 13),
             (("10.0.0.3", "10.0.0.2", 2222, 80), b"rpcxml" * 4, [3] * 8)],
            interleave_seed=1,
        )
        pcap = read_pcap(tf.name)
        want_fs = FlowStreamMatcher(m, "tcp", engine="ac",
                                    scan_bytes=16, width=64, min_lanes=8)
        got_fs = FlowStreamMatcher(m, "tcp", engine="window",
                                   scan_bytes=16, width=64, min_lanes=8)
        for fs in (want_fs, got_fs):
            fs.feed_pcap_slice(pcap)
            fs.flush()
        assert got_fs.counts().tolist() == want_fs.counts().tolist()
        assert got_fs.counts().sum() > 0
    print("flow-stream window round OK:", int(got_fs.counts().sum()),
          flush=True)
    print("ALL ROUND-5 TPU CHECKS OK", flush=True)


if __name__ == "__main__":
    main()
