"""Rule-push latency: swap_tables vs rebuilding the matcher.

A deployment updating its signature set cares about time-to-first-scan
under the NEW rules.  The table kernel's tables are jit arguments, so a
same-geometry swap should cost one host table build + a few-KB upload;
a fresh matcher pays the full (cached or cold) compile path.

Run on the TPU:  python bench/ruleset_swap.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multithreading_string_matching_tpu import Matcher

    rng = np.random.default_rng(0)
    payloads = rng.integers(1, 255, size=(512, 1024)).astype(np.uint8)
    lengths = np.full(512, 1024, np.int32)

    def ruleset(tag):
        return [b"%c%c%06d" % (65 + (tag % 26), 97 + (tag % 20), i)
                for i in range(768)]

    m = Matcher(ruleset(0))
    prep = m.prepare(payloads, lengths)
    t0 = time.time()
    np.asarray(m.count_prepared(prep))
    print(f"first-compile first-scan: {time.time()-t0:.2f}s "
          f"({m.explain()['pallas_kernel']})", flush=True)

    for tag in (1, 2):
        t0 = time.time()
        assert m.swap_patterns(ruleset(tag)) is True
        out = np.asarray(m.count_prepared(prep))
        print(f"swap_patterns -> first-scan: {time.time()-t0:.3f}s "
              f"(matches={int(out.sum())})", flush=True)

    t0 = time.time()
    m2 = Matcher(ruleset(3))
    np.asarray(m2.count_prepared(prep))
    print(f"fresh-matcher first-scan (warm persistent cache): "
          f"{time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
