#!/usr/bin/env python3
"""Produce docs/BER.md: bit/frame error rates across the codec attack
matrix (the reference's ber-test.sh / ber-mp3.sh / ber-ogg.sh harnesses
plus the harder generators: ber-double-mp3.sh, gen-speed-mk.sh,
gen-trunc-mk.sh, gen-short-clip-mk.sh), run against the native codec
bindings.

    python tools/ber_report.py [--seconds 60] [--seeds 2] [--out docs/BER.md]

Carriers (all deterministic, mirroring the varied real-music file list the
reference harness iterates, src/ber-test.sh:24-60):

  noise  — test-gen-noise; full-band energy everywhere (easiest case)
  music  — tonal harmonic stacks + percussion (sparse spectrum)
  speech — speech-like: harmonic buzz through formant resonances with
           syllabic AM and inter-phrase pauses (narrowband + gaps)
  chords — sustained polyphonic triads, no transients (stationary sparse
           spectrum: worst case for local-mean contrast)
  piano  — sparse struck tones with REAL digital-silence gaps (the
           patchwork gets zero usable frames inside the gaps)
  chirp  — repeating log sweep (wideband but nonstationary: every frame's
           spectrum differs from its neighbors)

Rows marked "control" are deliberate below-floor probes — the harness
FAILS if every such row still reports BER 0, because an attack matrix
that cannot produce an error proves nothing.
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

# (fixture, seconds, transform, strength, kind, description)
#   seconds: 0 = use --seconds (default 60 s ≈ one block: stresses the
#            single-block A/B paths); 200 puts THREE blocks in the carrier
#            so the AB join and the "all" chain recovery (src/wmget.cc:
#            554-701) are inside the BER loop, like the reference harness's
#            real music files (src/ber-test.sh:24-60)
#   kind: "floor"   — BASELINE.md guarantee, must be BER/FER 0
#         "info"    — measured robustness, no hard guarantee (trunc/clip
#                     probability-of-detection rows, sub-floor bitrates)
#         "control" — deliberately below floor; at least one control must
#                     produce BER > 0 or the harness fails
ROWS = [
    ("noise", 0, "none", "10", "floor", "lossless round trip"),
    ("noise", 0, "mp3:128", "10", "floor",
     "libmp3lame 128 kbit/s (README floor)"),
    ("noise", 0, "mp3:64", "10", "info",
     "libmp3lame 64 kbit/s (below floor)"),
    ("noise", 0, "ogg:128", "10", "floor",
     "libvorbisenc 128 kbit/s managed (README floor)"),
    ("noise", 0, "opus:128", "10", "floor",
     "libopus 128 kbit/s (48 kHz internal)"),
    ("noise", 0, "aac:128", "10", "floor", "native aac 128 kbit/s"),
    ("noise", 0, "resample:48000", "10", "floor",
     "48 kHz resample round trip"),
    ("noise", 0, "double-mp3:64:64", "10", "info",
     "double mp3 transcode 64->64 (ber-double-mp3.sh)"),
    ("noise", 0, "speed-mp3:0.9764:128", "10", "info",
     "speed 0.9764 then mp3 128, decoded --detect-speed (gen-speed-mk.sh)"),
    ("noise", 0, "trunc:15", "10", "info",
     "truncated to 15 s (gen-trunc-mk.sh)"),
    ("noise", 0, "clip:10", "10", "info",
     "random 10 s clip (gen-short-clip-mk.sh)"),
    ("music", 0, "none", "10", "floor", "tonal carrier, lossless round trip"),
    ("music", 0, "mp3:128", "10", "floor", "tonal carrier, mp3 128 (floor)"),
    ("music", 0, "ogg:128", "10", "floor", "tonal carrier, ogg 128 (floor)"),
    ("music", 0, "double-mp3:64:64", "10", "info",
     "tonal carrier, double mp3 transcode 64->64"),
    ("music", 0, "speed-mp3:0.9764:128", "10", "info",
     "tonal carrier, speed 0.9764 then mp3 128, --detect-speed"),
    ("music", 0, "mp3:32", "10", "control",
     "tonal carrier, mp3 32 kbit/s — far below floor control"),
    ("music", 0, "mp3:64", "2", "control",
     "tonal carrier, strength 2 + mp3 64 — weak-mark control"),
    ("speech", 0, "none", "10", "floor", "speech-like AM, lossless"),
    ("speech", 0, "mp3:128", "10", "floor",
     "speech-like AM, mp3 128 (floor)"),
    ("speech", 0, "ogg:128", "10", "floor", "speech-like AM, ogg 128 (floor)"),
    ("speech", 0, "double-mp3:64:64", "10", "info",
     "speech-like AM, double mp3 transcode 64->64"),
    ("chords", 0, "none", "10", "floor", "sustained polyphony, lossless"),
    ("chords", 0, "mp3:128", "10", "floor",
     "sustained polyphony, mp3 128 (floor)"),
    ("piano", 0, "none", "10", "floor",
     "sparse piano w/ silence gaps, lossless"),
    ("piano", 0, "mp3:128", "10", "floor",
     "sparse piano w/ silence gaps, mp3 128 (floor)"),
    ("piano", 0, "ogg:128", "10", "floor",
     "sparse piano w/ silence gaps, ogg 128 (floor)"),
    ("piano", 0, "mp3:32", "10", "control",
     "sparse piano, mp3 32 kbit/s — below-floor control"),
    ("chirp", 0, "none", "10", "floor", "repeating log sweep, lossless"),
    ("chirp", 0, "mp3:128", "10", "floor",
     "repeating log sweep, mp3 128 (floor)"),
    # ---- long multi-block carriers: 200 s = 3 blocks + AB + "all" chain
    # in the BER loop, mirroring the reference's full-length music corpus
    # (src/ber-test.sh:24-60, ber-mp3.sh, ber-ogg.sh) ----
    ("noise", 200, "none", "10", "floor",
     "3-block carrier, lossless round trip"),
    ("noise", 200, "mp3:128", "10", "floor",
     "3-block carrier, mp3 128 (floor)"),
    ("noise", 200, "ogg:128", "10", "floor",
     "3-block carrier, ogg 128 (floor)"),
    ("music", 200, "mp3:128", "10", "floor",
     "3-block tonal carrier, mp3 128 (floor)"),
    ("speech", 200, "mp3:128", "10", "floor",
     "3-block speech-like carrier, mp3 128 (floor)"),
    ("piano", 200, "mp3:128", "10", "floor",
     "3-block sparse-piano carrier, mp3 128 (floor)"),
    ("music", 200, "mp3:32", "10", "control",
     "3-block tonal carrier, mp3 32 — below-floor control"),
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


def _save_stereo(path: str, left, right, rate: int, peak: float = 0.6):
    stereo = np.empty(2 * left.size, np.float64)
    stereo[0::2] = left
    stereo[1::2] = right
    m = np.max(np.abs(stereo))
    if m > 0:
        stereo *= peak / m
    sys.path.insert(0, REPO)
    from audiowmark_tpu.io.wavdata import WavData
    WavData(stereo.astype(np.float32), 2, rate, 16).save(path)


def gen_speech(path: str, seconds: int, rate: int = 44100) -> None:
    """Speech-like carrier: a 120 Hz harmonic buzz shaped by three formant
    resonances (700/1200/2600 Hz), syllabic 3 Hz AM, and inter-phrase
    pauses — narrowband energy plus gaps, where patchwork bands starve."""
    rng = np.random.RandomState(77)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    buzz = np.zeros(n, np.float64)
    for h in range(1, 60):
        f = 120.0 * h
        if f > 6000:
            break
        buzz += np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)) / h
    spec = np.fft.rfft(buzz + 0.05 * rng.randn(n))
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    gain = np.zeros_like(freqs)
    for fc, bw, g in ((700, 130, 1.0), (1200, 180, 0.7), (2600, 300, 0.4)):
        gain += g / (1.0 + ((freqs - fc) / bw) ** 2)
    voiced = np.fft.irfft(spec * gain, n)
    # syllables (3 Hz) and phrase pauses (~0.5 s every ~2.5 s)
    env = 0.25 + 0.75 * np.sin(2 * np.pi * 3.0 * t) ** 2
    for k in range(int(seconds / 2.5)):
        p0 = int((k * 2.5 + 2.0 + rng.uniform(-0.2, 0.2)) * rate)
        env[p0: p0 + int(0.5 * rate)] *= 0.02
    voiced *= env
    _save_stereo(path, voiced, np.roll(voiced, 7), rate)


def gen_chords(path: str, seconds: int, rate: int = 44100) -> None:
    """Sustained polyphonic triads, one chord per 2 s bar, slow attack and
    release, light vibrato, NO transients: a stationary sparse spectrum
    minimizes the local-mean contrast the sync search keys on."""
    rng = np.random.RandomState(4242)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    left = np.zeros(n, np.float64)
    right = np.zeros(n, np.float64)
    roots = 130.81 * 2.0 ** (np.array([0, 5, 7, 3, 8]) / 12.0)
    for k in range(int(np.ceil(seconds / 2.0))):
        i0 = int(k * 2.0 * rate)
        i1 = min(int((k + 1) * 2.0 * rate), n)
        seg = t[i0:i1] - t[i0]
        env = np.minimum(seg / 0.3, 1.0) * np.minimum(
            (2.0 - seg) / 0.3, 1.0).clip(0.0, 1.0)
        root = roots[k % roots.size]
        for iv in (1.0, 2 ** (4 / 12.0), 2 ** (7 / 12.0), 2.0):
            vib = 1.0 + 0.002 * np.sin(2 * np.pi * 5.0 * seg)
            for h in range(1, 6):
                ph = rng.uniform(0, 2 * np.pi)
                left[i0:i1] += env * np.sin(
                    2 * np.pi * root * iv * h * seg * vib + ph) / h
                right[i0:i1] += env * np.sin(
                    2 * np.pi * root * iv * 1.002 * h * seg * vib + ph) / h
    _save_stereo(path, left, right, rate)


def gen_piano(path: str, seconds: int, rate: int = 44100) -> None:
    """Sparse struck tones with REAL digital silence between them: notes
    decay to exactly zero (gated), gaps of 0.8-2 s carry no energy at all,
    so whole stretches of frames give the patchwork nothing to read."""
    rng = np.random.RandomState(31415)
    n = int(seconds * rate)
    left = np.zeros(n, np.float64)
    right = np.zeros(n, np.float64)
    scale = 261.63 * 2.0 ** (np.array([0, 4, 7, 12, 16, 19, -12, -5]) / 12.0)
    pos = 0.0
    while pos < seconds - 1.0:
        f0 = scale[rng.randint(0, scale.size)]
        dur = 0.9
        i0 = int(pos * rate)
        i1 = min(int((pos + dur) * rate), n)
        seg = np.arange(i1 - i0) / rate
        env = np.minimum(seg / 0.005, 1.0) * np.exp(-seg * 6.0)
        gate = np.clip((dur - 0.05 - seg) / 0.05, 0.0, 1.0)  # end at 0
        tone = np.zeros(seg.size, np.float64)
        for h in range(1, 8):
            tone += np.sin(2 * np.pi * f0 * h * seg
                           + rng.uniform(0, 2 * np.pi)) / h ** 1.5
        left[i0:i1] += env * gate * tone
        right[i0:i1] += env * gate * np.roll(tone, 3)
        pos += dur + rng.uniform(0.8, 2.0)      # true silence gap
    _save_stereo(path, left, right, rate)


def gen_chirp(path: str, seconds: int, rate: int = 44100) -> None:
    """Repeating 5 s logarithmic sweep 100 Hz -> 8 kHz: wideband overall
    but nonstationary frame to frame, plus a -40 dB noise floor."""
    rng = np.random.RandomState(99)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    period = 5.0
    tau = t % period
    f0, f1 = 100.0, 8000.0
    k = np.log(f1 / f0) / period
    phase = 2 * np.pi * f0 * (np.exp(k * tau) - 1.0) / k
    sweep = np.sin(phase) * (0.5 + 0.5 * np.sin(2 * np.pi * tau / period
                                                - np.pi / 2) ** 2)
    noise = 0.01 * rng.randn(n)
    _save_stereo(path, sweep + noise, np.roll(sweep, 11) + noise, rate)


_GENERATORS = {
    "music": gen_tonal,
    "speech": gen_speech,
    "chords": gen_chords,
    "piano": gen_piano,
    "chirp": gen_chirp,
}


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
    ap.add_argument("--fixtures", default="",
                    help="comma list to restrict carriers (dev aid)")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "BER.md"))
    args = ap.parse_args()

    only = {f.strip() for f in args.fixtures.split(",") if f.strip()}
    todo = [r for r in ROWS if not only or r[0] in only]

    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")
    with tempfile.TemporaryDirectory() as tmpdir:
        fixtures = {}       # (name, seconds) -> path
        needed = {(r[0], r[1] or args.seconds) for r in todo}
        for name, secs in sorted(needed):
            p = os.path.join(tmpdir, "%s_%d.wav" % (name, secs))
            if name == "noise":
                subprocess.run(
                    [sys.executable, os.path.join(REPO, "audiowmark"),
                     "test-gen-noise", p, str(secs), "44100"],
                    env=env, check=True, cwd=REPO)
            else:
                _GENERATORS[name](p, secs)
            fixtures[(name, secs)] = p

        rows = []
        for fixture, secs, transform, strength, kind, desc in todo:
            secs = secs or args.seconds
            ber, fer = run_ber(fixtures[(fixture, secs)], transform,
                               strength, args.seeds)
            label = fixture if secs == args.seconds else \
                "%s@%ds" % (fixture, secs)
            rows.append((label, transform, strength, kind, desc,
                         ber, fer))
            print("%-11s %-22s s=%-3s %-7s ber=%.6f (%s/%s)  "
                  "fer=%.6f (%s/%s)"
                  % (label, transform, strength, kind, ber[0], ber[1],
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
        "and deterministic hard fixtures (sparse/tonal/speech-like/gapped "
        "spectra).  %d s, 44.1 kHz stereo, %d random 128-bit payloads "
        "per row; rows tagged `@200s` use 200 s three-block carriers so "
        "the AB join and the 'all' chain recovery are inside the BER loop "
        "(the single-block rows only stress A/B).  Rows marked CONTROL are "
        "deliberately below the robustness floor; they must produce BER > "
        "0 for the zero rows to mean anything."
        % (args.seconds, args.seeds),
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
    # every non-CONTROL row with BER > 0 gets called out explicitly — a
    # nonzero number hidden in a long table is a judgement dodge
    nonzero = [r for r in rows if r[3] != "control" and r[5][0] > 0]
    lines += ["", "## Non-control rows with BER > 0", ""]
    if nonzero:
        for fixture, transform, strength, kind, desc, ber, fer in nonzero:
            lines.append(
                "- **%s / `%s`** (%s): BER %.6f, FER %.6f — %s.%s"
                % (fixture, transform, kind.upper(), ber[0], fer[0], desc,
                   " FER 0: every payload still fully recovered despite "
                   "raw bit errors (the conv/short code corrected them)."
                   if fer[0] == 0 else
                   " FLOOR VIOLATION — see stderr of the generating run."
                   if kind == "floor" else ""))
    else:
        lines.append("None — every non-control row decoded error-free.")
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
