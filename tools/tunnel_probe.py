#!/usr/bin/env python
"""Tiny axon-tunnel health probe (rounds 2/4/5 all hit multi-hour
outages; this is the cheap way to distinguish outage from compile-service
congestion before burning a measurement session).

Runs ONE small cached-program round trip with a hard deadline. The
program is fixed so after the first-ever run it hits the persistent
compile cache and the probe measures pure dispatch+fence (~1-2 s when
healthy). Exit 0 healthy, 2 unreachable (deadline), 3 compile endpoint
down (connection refused surfaces as a JaxRuntimeError).

Usage: python tools/tunnel_probe.py [deadline_s]   (default 45)
       watch -n 240 python tools/tunnel_probe.py   # the round-4 loop
"""

import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache(quiet=True)


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0

    def fire():
        print(f"UNREACHABLE: no round trip within {deadline:.0f}s",
              flush=True)
        os._exit(2)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()

    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    try:
        x = jnp.ones((388, 584))
        out = np.asarray(jax.jit(lambda a: jnp.tanh(a @ a.T) * 1.007)(x))
    except Exception as e:  # compile endpoint down, backend error, ...
        print(f"ERROR: {type(e).__name__}: {e}", flush=True)
        os._exit(3)
    t.cancel()
    assert np.isfinite(out).all()
    print(f"OK: round trip {time.time() - t0:.1f}s "
          f"({jax.devices()[0].platform})", flush=True)


if __name__ == "__main__":
    main()
