"""Attribute detect_speed wall-clock between the fused scan's two
gather-bound stages.

The fused speed scan (ops/speed_fused.py) has two costs that scale
differently:

* resample + spectrogram — per CENTER (independent of the rel count):
  the 96-tap windowed-sinc gather (~57M gathered (C,) rows per scan1
  center) plus the band-DFT matmul.
* offset compare — per (center, REL): the (states x entries) fixed-point
  gather over the mag matrix (~6.8M gathered (up,down) pairs per rel).

Running scan1 once with its real 11 rels and once with rels=[1.0] on the
same clip separates them: the 1-rel run pays resample+spec plus one
compare, so  compare_total = (t_full - t_1rel) * R/(R-1)  and
resample+spec = t_full - compare_total.  scan3 (1 center, 81 rels, 50 s
clip) bounds the compare-dominated regime from the other side.

Run standalone (fresh process pays the 90-220 s tunnel cold-start once):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/speed_attrib.py
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from audiowmark_tpu.cli import test_gen_noise            # noqa: E402
from audiowmark_tpu.crypto.keys import Key               # noqa: E402
from audiowmark_tpu.io.wavdata import WavData            # noqa: E402
from audiowmark_tpu.models.speed import ScanParams       # noqa: E402
from audiowmark_tpu.ops import speed_fused               # noqa: E402
from audiowmark_tpu.ops.resample import resample_ratio   # noqa: E402
from audiowmark_tpu.ops.speed import build_speed_sync_bits  # noqa: E402
from audiowmark_tpu.tables import get_key_tables         # noqa: E402

RATE = 44100
SPEED = 0.9764


def _timed_scan(clip, scan: ScanParams, speeds, rels, sync_bits):
    centers = [speed * scan.step ** (c * (scan.n_steps * 2 + 1))
               for speed in speeds
               for c in range(-scan.n_center_steps, scan.n_center_steps + 1)]
    n = clip.n_channels
    frames = min(clip.samples.size // n,
                 int(scan.seconds * 1.3 * clip.sample_rate))
    samples = clip.samples[: frames * n]
    # warm (compile + upload path), then time
    speed_fused.speed_scan(samples, n, centers, scan.seconds, rels,
                           sync_bits)
    t0 = time.monotonic()
    speed_fused.speed_scan(samples, n, centers, scan.seconds, rels,
                           sync_bits)
    return time.monotonic() - t0, len(centers)


def main():
    tmp = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    infile = os.path.join(tmp, "speed_attrib_in.wav")
    key = Key()
    test_gen_noise(key, infile, 30, RATE, 16)
    wav = WavData.load(infile)
    os.remove(infile)
    clip = resample_ratio(wav, 1.0 / SPEED, RATE)
    sync_bits = build_speed_sync_bits(get_key_tables(key))

    scan1 = ScanParams(25, 1.0007, 5, 28)
    scan3 = ScanParams(50, 1.00005, 40)
    rels1 = [scan1.step ** p for p in range(-scan1.n_steps,
                                            scan1.n_steps + 1)]
    rels3 = [scan3.step ** p for p in range(-scan3.n_steps,
                                            scan3.n_steps + 1)]

    print("warming tunnel + compiles ...", file=sys.stderr)
    t_full1, n_centers = _timed_scan(clip, scan1, [1.0], rels1, sync_bits)
    print("scan1 full: %.2f s (%d centers x %d rels)"
          % (t_full1, n_centers, len(rels1)), file=sys.stderr)
    t_1rel, _ = _timed_scan(clip, scan1, [1.0], [1.0], sync_bits)
    print("scan1 1-rel: %.2f s" % t_1rel, file=sys.stderr)
    t_scan3, _ = _timed_scan(clip, scan3, [SPEED], rels3, sync_bits)
    print("scan3 (1 center x %d rels): %.2f s" % (len(rels3), t_scan3),
          file=sys.stderr)

    R = len(rels1)
    compare1 = max(0.0, (t_full1 - t_1rel) * R / (R - 1))
    result = {
        "scan1_full_s": round(t_full1, 2),
        "scan1_1rel_s": round(t_1rel, 2),
        "scan1_compare_est_s": round(compare1, 2),
        "scan1_resample_spec_est_s": round(t_full1 - compare1, 2),
        "scan3_s": round(t_scan3, 2),
        "scan1_centers": n_centers,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
