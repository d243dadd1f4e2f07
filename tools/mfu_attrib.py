"""Attribute the fused detector's wall-clock and FLOPs per pipeline stage.

bench.py reports one MFU number for the whole embed+detect step; this tool
answers "where do the other ~98% go" (round-3 review weak #6) by timing the
detector truncated after each stage (DetectorConfig.stage) and diffing:

  spectrogram   hop-256 dB spectrogram: band_dot matmul + log2
  sweep         D = V @ S^T + static-slice score sweep + local mean + top-k
  refine        per-candidate +-256/step-8 grid refine (stacked band_dot)
  candidates    + per-candidate 2226-frame block FFT + mix_decode soft bits
  full          + batched 2^15-state A/B Viterbi (Pallas trellis)

Each stage's jit also reports XLA's own cost_analysis() FLOP estimate, so
the output table carries (incremental seconds, incremental GFLOP, stage
MFU).  Run standalone on the TPU (NEVER while pytest runs — CLAUDE.md):

    python tools/mfu_attrib.py [--seconds 120] [--iters 5]

Reference cost centers being attributed: src/syncfinder.cc:172-458 (sweep),
src/wmget.cc:503-553 (block decode + Viterbi).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
if os.environ.get("AUDIOWMARK_JAX_PLATFORM"):
    jax.config.update("jax_platforms",
                      os.environ["AUDIOWMARK_JAX_PLATFORM"])

import jax.numpy as jnp

from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.ops.detect_fused import DetectorConfig, build_detector
from audiowmark_tpu.ops.frames import FRAME

RATE = 44100
STAGES = ["spectrogram", "sweep", "refine", "candidates", "full"]


def build_stage_step(key, T, stage):
    det = build_detector(key, DetectorConfig(n_frames=T, n_channels=2,
                                             top_k=8, stage=stage))

    def step(seed):
        rng = jax.random.PRNGKey(seed)
        audio = jax.random.uniform(rng, (T * FRAME, 2), jnp.float32,
                                   -1.0, 1.0)
        out = det(audio)
        if stage == "full":
            return (jnp.sum(out["qualities"]) + jnp.sum(out["errors"])
                    + jnp.sum(out["bits"].astype(jnp.float32)))
        return out["probe"]

    return jax.jit(step)


def measure(step, iters):
    lowered = step.lower(0)
    compiled = lowered.compile()
    flops = 0.0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    float(step(0))                       # warm (forces real fetch)
    times = []
    for rep in range(3):
        t0 = time.monotonic()
        acc = 0.0
        for i in range(iters):
            acc += step(1 + rep * iters + i)
        float(acc)
        times.append((time.monotonic() - t0) / iters)
    return sorted(times)[1], flops       # median


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=120)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import bench                          # peak FLOP/s table + embed step
    peak = bench._device_peak_flops()
    backend = jax.default_backend()
    kind = jax.devices()[0].device_kind
    print("backend=%s kind=%s peak=%.0fT" % (backend, kind, peak / 1e12),
          file=sys.stderr)

    key = Key()
    T = args.seconds * RATE // FRAME

    rows = []
    prev_t, prev_f = 0.0, 0.0
    for stage in STAGES:
        step = build_stage_step(key, T, stage)
        t, f = measure(step, args.iters)
        rows.append((stage, t, f, t - prev_t, f - prev_f))
        prev_t, prev_f = t, f
        print("stage %-12s cum %7.4fs  cumGF %9.1f  inc %7.4fs  incGF %9.1f"
              % (stage, t, f / 1e9, rows[-1][3], rows[-1][4] / 1e9),
              file=sys.stderr)

    # the bench's full embed+limiter+detect step, for the embed share
    import bench as B
    full_step, _ = B.build_pipeline()
    t_full, f_full = measure(full_step, args.iters)
    print("stage %-12s cum %7.4fs  cumGF %9.1f   (embed+limiter+detect)"
          % ("bench_step", t_full, f_full / 1e9), file=sys.stderr)

    out = {
        "seconds_audio": args.seconds,
        "backend": backend,
        "device_kind": kind,
        "peak_tflops": peak / 1e12,
        "detect_total_s": rows[-1][1],
        "bench_step_s": t_full,
        "embed_limiter_s": max(0.0, t_full - rows[-1][1]),
        "stages": [
            {"stage": s, "cum_s": round(t, 5), "inc_s": round(it, 5),
             "inc_gflop": round(inf / 1e9, 2),
             "inc_mfu": round(inf / it / peak, 5) if peak and it > 0 else -1,
             "inc_pct_of_detect": round(100.0 * it / rows[-1][1], 1)}
            for s, t, f, it, inf in rows],
        "step_mfu": round(f_full / t_full / peak, 5) if peak else -1,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
