#!/usr/bin/env python3
"""Produce docs/BER.md: bit/frame error rates across the codec attack
matrix (the reference's ber-test.sh / ber-mp3.sh / ber-ogg.sh harnesses
plus the harder generators: ber-double-mp3.sh, gen-speed-mk.sh,
gen-trunc-mk.sh, gen-short-clip-mk.sh), run against the native codec
bindings.

    python tools/ber_report.py [--seconds 60] [--seeds 2] [--out docs/BER.md]

Two carriers: deterministic noise (the easiest case for a patchwork
watermark — full-band energy everywhere) and a deterministic tonal
"music" fixture (harmonic stacks + percussion; sparse spectra are the
hard case).  Rows marked expect_errors=True are deliberate below-floor
controls — the harness FAILS if every such row still reports BER 0,
because an attack matrix that cannot produce an error proves nothing.
"""

import argparse
import datetime
import io
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (fixture, transform, strength, kind, description)
#   kind: "floor"   — BASELINE.md guarantee, must be BER/FER 0
#         "info"    — measured robustness, no hard guarantee (trunc/clip
#                     probability-of-detection rows, sub-floor bitrates)
#         "control" — deliberately below floor; at least one control must
#                     produce BER > 0 or the harness fails
ROWS = [
    ("noise", "none", "10", "floor", "lossless round trip"),
    ("noise", "mp3:128", "10", "floor",
     "libmp3lame 128 kbit/s (README floor)"),
    ("noise", "mp3:64", "10", "info", "libmp3lame 64 kbit/s (below floor)"),
    ("noise", "ogg:128", "10", "floor",
     "libvorbisenc 128 kbit/s managed (README floor)"),
    ("noise", "opus:128", "10", "floor",
     "libopus 128 kbit/s (48 kHz internal)"),
    ("noise", "aac:128", "10", "floor", "native aac 128 kbit/s"),
    ("noise", "resample:48000", "10", "floor",
     "48 kHz resample round trip"),
    ("noise", "double-mp3:64:64", "10", "info",
     "double mp3 transcode 64->64 (ber-double-mp3.sh)"),
    ("noise", "speed-mp3:0.9764:128", "10", "info",
     "speed 0.9764 then mp3 128, decoded --detect-speed (gen-speed-mk.sh)"),
    ("noise", "trunc:15", "10", "info",
     "truncated to 15 s (gen-trunc-mk.sh)"),
    ("noise", "clip:10", "10", "info",
     "random 10 s clip (gen-short-clip-mk.sh)"),
    ("music", "none", "10", "floor", "tonal carrier, lossless round trip"),
    ("music", "mp3:128", "10", "floor", "tonal carrier, mp3 128 (floor)"),
    ("music", "mp3:32", "10", "control",
     "tonal carrier, mp3 32 kbit/s — far below floor control"),
    ("music", "mp3:64", "2", "control",
     "tonal carrier, strength 2 + mp3 64 — weak-mark control"),
]


def gen_tonal(path: str, seconds: int, rate: int = 44100) -> None:
    """Deterministic music-like fixture: pentatonic harmonic stacks with
    per-note envelopes, slight inter-channel detune, and percussive noise
    ticks.  The sparse spectrum (most up/down bands sit near the dB floor)
    makes this a much harder carrier than full-band noise."""
    rng = np.random.RandomState(1234)
    t = np.arange(int(seconds * rate)) / rate
    scale = 220.0 * 2.0 ** (np.array([0, 2, 4, 7, 9, 12, 14, 16]) / 12.0)
    note_len = 0.5
    n_notes = int(np.ceil(seconds / note_len))
    left = np.zeros(t.size, np.float64)
    right = np.zeros(t.size, np.float64)
    for k in range(n_notes):
        f0 = scale[rng.randint(0, scale.size)]
        i0 = int(k * note_len * rate)
        i1 = min(int((k + 1) * note_len * rate), t.size)
        seg = t[i0:i1] - t[i0]
        env = np.minimum(seg / 0.02, 1.0) * np.exp(-seg * 3.0)
        tone = np.zeros(seg.size, np.float64)
        for h in range(1, 7):
            tone += np.sin(2 * np.pi * f0 * h * seg
                           + rng.uniform(0, 2 * np.pi)) / h
        left[i0:i1] += env * tone
        tone_r = np.zeros(seg.size, np.float64)
        for h in range(1, 7):
            tone_r += np.sin(2 * np.pi * f0 * 1.003 * h * seg
                             + rng.uniform(0, 2 * np.pi)) / h
        right[i0:i1] += env * tone_r
    # percussion ticks every quarter note
    for k in range(int(seconds / 0.25)):
        i0 = int(k * 0.25 * rate)
        n = int(0.02 * rate)
        if i0 + n > t.size:
            break
        burst = rng.randn(n) * np.exp(-np.arange(n) / (0.004 * rate))
        left[i0:i0 + n] += 0.4 * burst
        right[i0:i0 + n] += 0.4 * burst
    stereo = np.empty(2 * t.size, np.float64)
    stereo[0::2] = left
    stereo[1::2] = right
    stereo *= 0.6 / np.max(np.abs(stereo))

    sys.path.insert(0, REPO)
    from audiowmark_tpu.io.wavdata import WavData
    WavData(stereo.astype(np.float32), 2, rate, 16).save(path)


def run_ber(wav, transform, strength, seeds):
    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu",
               PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ber_test.py"), wav,
         "--seeds", str(seeds), "--transform", transform,
         "--strength", strength],
        env=env, capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        raise RuntimeError("%s failed:\n%s%s" % (transform, r.stdout,
                                                 r.stderr))
    ber = fer = None
    for line in r.stdout.splitlines():
        m = re.match(r"ber ([0-9.]+) \((\d+)/(\d+)\)", line)
        if m:
            ber = (float(m.group(1)), m.group(2), m.group(3))
        m = re.match(r"fer ([0-9.]+) \((\d+)/(\d+)\)", line)
        if m:
            fer = (float(m.group(1)), m.group(2), m.group(3))
    assert ber and fer, r.stdout
    return ber, fer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "BER.md"))
    args = ap.parse_args()

    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")
    with tempfile.TemporaryDirectory() as tmpdir:
        fixtures = {}
        noise = os.path.join(tmpdir, "noise.wav")
        subprocess.run([sys.executable, os.path.join(REPO, "audiowmark"),
                        "test-gen-noise", noise, str(args.seconds), "44100"],
                       env=env, check=True, cwd=REPO)
        fixtures["noise"] = noise
        music = os.path.join(tmpdir, "music.wav")
        gen_tonal(music, args.seconds)
        fixtures["music"] = music

        rows = []
        for fixture, transform, strength, kind, desc in ROWS:
            ber, fer = run_ber(fixtures[fixture], transform, strength,
                               args.seeds)
            rows.append((fixture, transform, strength, kind, desc,
                         ber, fer))
            print("%-7s %-22s s=%-3s %-7s ber=%.6f (%s/%s)  "
                  "fer=%.6f (%s/%s)"
                  % (fixture, transform, strength, kind, ber[0], ber[1],
                     ber[2], fer[0], fer[1], fer[2]), flush=True)

    # the controls must show the harness CAN see errors
    control_errs = [r[5][0] for r in rows if r[3] == "control"]
    if control_errs and max(control_errs) == 0.0:
        print("WARNING: no below-floor control produced BER > 0 — "
              "the all-zeros rows are unverifiable", file=sys.stderr)
        return 1
    # and the floors must hold
    floor_bad = [r for r in rows if r[3] == "floor" and r[6][0] > 0]
    if floor_bad:
        print("FLOOR VIOLATION: %s" % [(r[0], r[1]) for r in floor_bad],
              file=sys.stderr)

    lines = [
        "# BER / FER robustness report",
        "",
        "Attack matrix of the reference's ber-test harnesses "
        "(`src/ber-test.sh`, `ber-mp3.sh`, `ber-ogg.sh`, "
        "`ber-double-mp3.sh`, `gen-speed-mk.sh`, `gen-trunc-mk.sh`, "
        "`gen-short-clip-mk.sh`), run against the native codec bindings "
        "(libmp3lame, libvorbisenc, libopus/aac via the libav shim).",
        "",
        "Carriers: deterministic `test-gen-noise` (easy: full-band energy) "
        "and a deterministic tonal fixture (hard: sparse harmonic spectrum "
        "+ percussion).  %d s, 44.1 kHz stereo, %d random 128-bit payloads "
        "per row.  Rows marked CONTROL are deliberately below the "
        "robustness floor; they must produce BER > 0 for the zero rows to "
        "mean anything." % (args.seconds, args.seeds),
        "",
        "BASELINE.md floor: watermark retrievable (FER 0) after MP3/Ogg "
        "encoding at >= 128 kbit/s at default strength.",
        "",
        "| carrier | transform | strength | kind | BER | FER | note |",
        "|---|---|---|---|---|---|---|",
    ]
    for fixture, transform, strength, kind, desc, ber, fer in rows:
        lines.append("| %s | `%s` | %s | %s | %.6f (%s/%s) "
                     "| %.6f (%s/%s) | %s |"
                     % (fixture, transform, strength, kind.upper(), ber[0],
                        ber[1], ber[2], fer[0], fer[1], fer[2], desc))
    lines += [
        "",
        "Generated by `python tools/ber_report.py` on %s."
        % datetime.date.today().isoformat(),
    ]
    with io.open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote %s" % args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
