#!/usr/bin/env python3
"""Streaming time-to-first-byte measurement (reference: src/ttfb-test.py).

Feeds a WAV stream into `audiowmark add - - <msg>` through pipes and measures
the wall time until the first watermarked byte appears on stdout, plus total
throughput.  Usage:

    python tools/ttfb_test.py <input_wav> [message_hex]
"""

import os
import subprocess
import sys
import time


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    infile = sys.argv[1]
    msg = sys.argv[2] if len(sys.argv) > 2 else "f0" * 16

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cli = [sys.executable, "-m", "audiowmark_tpu"]
    env = dict(os.environ, PYTHONPATH=here + ":" + os.environ.get("PYTHONPATH", ""))

    start = time.monotonic()
    with open(infile, "rb") as f:
        proc = subprocess.Popen(
            cli + ["-q", "add", "--output-format", "wav-pipe", "-", "-", msg],
            stdin=f, stdout=subprocess.PIPE, env=env, cwd=here)
        first = proc.stdout.read(1)
        ttfb = time.monotonic() - start
        total = len(first)
        while True:
            chunk = proc.stdout.read(1 << 20)
            if not chunk:
                break
            total += len(chunk)
        elapsed = time.monotonic() - start
        proc.wait()

    print("ttfb %.3f s" % ttfb)
    print("total %.3f s, %d bytes (%.1f MB/s)"
          % (elapsed, total, total / max(elapsed, 1e-9) / 1e6))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
