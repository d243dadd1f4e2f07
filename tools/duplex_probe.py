#!/usr/bin/env python3
"""Measure whether the host<->TPU link overlaps an upload with a download.

Production add/get wall time is dominated by moving the audio over the
link (CLAUDE.md io-floor notes).  A tiled add pipeline (upload tile i+1
while fetching tile i-1) only pays off if the transport is full-duplex;
this probe times upload-only, download-only, and both-concurrent to give
the answer before committing to the redesign.

Usage: python tools/duplex_probe.py  (takes ~2 min incl. tunnel cold start)
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = 16 << 20                       # 32 MB of int16 per direction
    up_host = np.random.randint(-32768, 32767, n, dtype=np.int16)
    # warm: pay cold start + materialize a device source for downloads
    dev_src = jnp.asarray(np.random.randint(-32768, 32767, n,
                                            dtype=np.int16))
    np.asarray(dev_src[:8])            # force completion

    def up():
        d = jax.device_put(up_host)
        d.block_until_ready()
        np.asarray(d[:1])              # scalar fetch = real sync

    dl_cache = [jnp.asarray(dev_src + np.int16(i)) for i in range(6)]
    for d in dl_cache:
        np.asarray(d[:1])

    def down(i):
        np.asarray(dl_cache[i])        # full fetch (distinct arrays:
                                       # client-side cache can't serve it)

    # sequential baselines (median of 3)
    ups, downs = [], []
    for i in range(3):
        t0 = time.monotonic(); up(); ups.append(time.monotonic() - t0)
        t0 = time.monotonic(); down(i); downs.append(time.monotonic() - t0)
    up_s, down_s = sorted(ups)[1], sorted(downs)[1]

    # concurrent: one thread uploads while the main thread downloads
    t0 = time.monotonic()
    th = threading.Thread(target=up)
    th.start()
    down(3)
    th.join()
    both_s = time.monotonic() - t0
    t0 = time.monotonic()
    th = threading.Thread(target=up)
    th.start()
    down(4)
    th.join()
    both_s = min(both_s, time.monotonic() - t0)

    mb = n * 2 / 1e6
    print("upload   %6.2f s  (%.0f MB/s)" % (up_s, mb / up_s))
    print("download %6.2f s  (%.0f MB/s)" % (down_s, mb / down_s))
    print("both     %6.2f s  vs serial %.2f s -> overlap factor %.2f"
          % (both_s, up_s + down_s, (up_s + down_s) / both_s))
    print("verdict: %s" % (
        "FULL-DUPLEX (tiled add pipeline pays)" if both_s < 0.75 *
        (up_s + down_s) else "effectively half-duplex (pipeline only "
        "hides compute, not transfers)"))


if __name__ == "__main__":
    main()
