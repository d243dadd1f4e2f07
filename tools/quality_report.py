#!/usr/bin/env python3
"""Produce docs/QUALITY.md: perceptual-quality measurements of the
embedded watermark across strengths and carriers.

Counterpart of the reference's quality harnesses:
  * src/snr.sh           — mean SNR of `audiowmark add --snr` over a corpus
  * src/strength2snr.sh  — the strength -> SNR sweep (30 20 15 10 5 3 2 1)
  * src/peaq.sh          — ODG via the external GstPEAQ `peaq` binary; that
    binary does not exist in this image, so this tool reports a native
    PEAQ-style noise-to-mask ratio (NMR) proxy instead: Bark-band masking
    threshold from the original signal (spreading + tonality offset +
    absolute threshold in quiet), watermark delta measured against it.
    NMR < 0 dB means the watermark energy sits below the masked threshold
    in the average critical band (inaudible by this model).

    python tools/quality_report.py [--seconds 30] [--out docs/QUALITY.md]

SNR comes from the production `add --snr` CLI path (src/wmadd.cc:553-592
semantics: 10*log10(signal_power/delta_power) over all samples).

Checks enforced (the tool exits nonzero if violated):
  * SNR is monotonically decreasing in strength (stronger mark = more
    delta power), tolerance 0.1 dB.
  * Default strength 10 keeps SNR >= 20 dB on both carriers.
  * Default strength 10 keeps mean NMR <= 0 dB (delta below the masked
    threshold) on both carriers.
"""

import argparse
import contextlib
import datetime
import io
import os
import re
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("AUDIOWMARK_JAX_PLATFORM", "cpu")

PATTERN = "4e1243bd22c66e76c2ba9eddc1f91394"   # snr.sh's pseudo pattern
STRENGTHS = [30, 20, 15, 10, 5, 3, 2, 1]       # strength2snr.sh sweep
RATE = 44100


# ---------------------------------------------------------------- carriers

def gen_noise(path: str, seconds: int) -> None:
    """`test-gen-noise` fixture scaled to 0.6 peak: at full scale the
    limiter engages and its broadband gain riding dominates the file
    delta, so NMR would measure the limiter, not the watermark.  Real
    music carriers (and the tonal fixture) have this headroom anyway."""
    from audiowmark_tpu.cli import main as cli_main
    from audiowmark_tpu.io.wavdata import WavData
    from audiowmark_tpu.params import Params
    Params.reset()
    rc = cli_main(["test-gen-noise", path, str(seconds), str(RATE)])
    assert rc == 0
    w = WavData.load(path)
    scaled = w.samples * (0.6 / np.max(np.abs(w.samples)))
    WavData(scaled.astype(np.float32), w.n_channels, w.sample_rate,
            w.bit_depth).save(path)


def gen_music(path: str, seconds: int) -> None:
    from tools.ber_report import gen_tonal
    gen_tonal(path, seconds, RATE)


# ---------------------------------------------------------------- embed

def add_with_snr(src: str, dst: str, strength: int) -> float:
    """Run the production `add --snr` and parse the reported SNR dB."""
    from audiowmark_tpu.cli import main as cli_main
    from audiowmark_tpu.params import Params
    Params.reset()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = cli_main(["add", src, dst, PATTERN,
                       "--strength", str(strength), "--snr"])
    assert rc == 0, err.getvalue()
    m = re.search(r"SNR:\s+([-0-9.]+) dB", err.getvalue())
    assert m, "no SNR line in:\n" + err.getvalue()
    return float(m.group(1))


# ---------------------------------------------------------------- NMR proxy

_FFT = 2048
_HOP = 1024
_N_BARK = 24


def _bark(f):
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


def _ath_db(f):
    """Absolute threshold in quiet (Terhardt), dB SPL; clamped for f=0."""
    khz = np.maximum(f, 20.0) / 1000.0
    return (3.64 * khz ** -0.8 - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
            + 1e-3 * khz ** 4)


def nmr_db(orig: np.ndarray, marked: np.ndarray, n_channels: int) -> float:
    """Mean noise-to-mask ratio of the watermark delta, dB.

    Masking model (PEAQ-basic flavoured, intentionally simple): per-frame
    Bark-band signal energies, spread with -27 dB/Bark upward and
    -10 dB/Bark downward slopes, offset per frame by the Johnston /
    MPEG-1-model-1 tonality interpolation — alpha*(14.5 + z) +
    (1 - alpha)*5.5 dB where alpha comes from the spectral flatness
    measure (noise maskers mask ~9 dB better than tones) — floored at
    the absolute threshold in quiet scaled so that a full-scale sine at
    4 kHz maps to 96 dB SPL, with exponential forward (post-) masking of
    ~5 dB per 23 ms hop carried across frames (PEAQ's temporal spreading;
    matters on percussive material where the delta rings past the tick).
    """
    orig = orig.reshape(-1, n_channels).astype(np.float64)
    marked = marked.reshape(-1, n_channels).astype(np.float64)
    n = min(orig.shape[0], marked.shape[0])
    delta = marked[:n] - orig[:n]
    orig = orig[:n]

    freqs = np.fft.rfftfreq(_FFT, 1.0 / RATE)
    band = np.minimum(_bark(freqs).astype(np.int32), _N_BARK - 1)
    group = np.zeros((_N_BARK, freqs.size))
    group[band, np.arange(freqs.size)] = 1.0
    zc = np.array([np.mean(_bark(freqs)[band == b]) if np.any(band == b)
                   else b for b in range(_N_BARK)])
    # spreading matrix (dB slopes -> linear gains, row = masked band)
    dz = zc[:, None] - zc[None, :]          # masked - masker
    spread_db = np.where(dz >= 0, -27.0 * dz, 10.0 * dz)
    spread = 10.0 ** (spread_db / 10.0)
    # ATH in the same power units: full-scale sine ~ 96 dB SPL
    ath_pow = 10.0 ** ((_ath_db(freqs) - 96.0) / 10.0) * (_FFT / 2.0) ** 2
    ath_band = group @ ath_pow

    win = np.hanning(_FFT)
    n_frames = max(0, (n - _FFT) // _HOP + 1)
    post_decay = 10.0 ** (-5.0 / 10.0)     # -5 dB per hop forward masking
    ratios = []
    for ch in range(n_channels):
        prev_thr = np.zeros(_N_BARK)
        for k in range(n_frames):
            i0 = k * _HOP
            s = np.fft.rfft(orig[i0:i0 + _FFT, ch] * win)
            d = np.fft.rfft(delta[i0:i0 + _FFT, ch] * win)
            spow = group @ (np.abs(s) ** 2)
            dpow = group @ (np.abs(d) ** 2)
            if np.sum(spow) < 1e-9:        # silent frame: nothing to mask
                continue
            masked = spread @ spow
            # tonality via spectral flatness (geometric/arithmetic mean)
            p = np.abs(s) ** 2 + 1e-30
            sfm_db = 10.0 * (np.mean(np.log10(p)) - np.log10(np.mean(p)))
            alpha = min(sfm_db / -60.0, 1.0)
            offset_db = alpha * (14.5 + zc) + (1.0 - alpha) * 5.5
            offset = 10.0 ** (-offset_db / 10.0)
            thr = np.maximum(masked * offset, ath_band)
            thr = np.maximum(thr, prev_thr * post_decay)
            prev_thr = thr
            ratios.append(np.mean(dpow / thr))
    return 10.0 * np.log10(np.mean(ratios)) if ratios else float("-inf")


# ------------------------------------------------------- codec anchors

# MP3 bitrate ladder used to CALIBRATE the NMR proxy on stimuli with
# known perceptual ordering and published quality operating points:
# listening tests and PEAQ evaluations consistently place stereo MP3 at
# >= 256 kbit/s in the transparent range (ODG ~ 0 .. -0.5), 128 kbit/s
# around "perceptible, not annoying" (ODG ~ -1 .. -2 on critical items),
# and 64 kbit/s clearly degraded (ODG <= -3).  The proxy must rank the
# ladder monotonically (ordinal validity), and the watermark at default
# strength must score no worse than the 256 kbit/s transparent anchor.
ANCHOR_BITRATES = [320, 256, 128, 64]
# approximate published ODG operating points for the anchor ladder
# (coarse literature ranges, used only for an ordinal NMR -> ODG-region
# interpolation, not as exact per-item predictions)
ANCHOR_ODG = {320: -0.2, 256: -0.5, 128: -1.5, 64: -3.2}


def _align_delay(ref: np.ndarray, test: np.ndarray, n_channels: int,
                 max_lag: int = 4096) -> int:
    """Codec round trips shift the timeline (encoder/decoder delay).
    Find the lag of `test` relative to `ref` by cross-correlating one
    channel over a bounded window; NMR on unaligned deltas would measure
    the shift, not the coding noise."""
    a = ref.reshape(-1, n_channels)[: RATE * 5, 0].astype(np.float64)
    b = test.reshape(-1, n_channels)[: RATE * 5 + max_lag, 0] \
        .astype(np.float64)
    n = 1
    while n < b.size:
        n *= 2
    corr = np.fft.irfft(np.fft.rfft(b, n) * np.conj(np.fft.rfft(a, n)), n)
    return int(np.argmax(corr[: max_lag + 1]))


def mp3_anchor_nmr(orig, bitrate: int) -> float:
    """NMR of an mp3 round trip at `bitrate` against the original — the
    codec's coding noise scored by the same model as the watermark delta."""
    from audiowmark_tpu.io.lame import encode_mp3
    from audiowmark_tpu.io.wavdata import WavData
    data = encode_mp3(orig.samples, orig.n_channels, orig.sample_rate,
                      bitrate)
    with tempfile.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
        f.write(data)
        name = f.name
    try:
        dec = WavData.load(name)
    finally:
        os.remove(name)
    lag = _align_delay(orig.samples, dec.samples, orig.n_channels)
    aligned = dec.samples.reshape(-1, orig.n_channels)[lag:].reshape(-1)
    return nmr_db(orig.samples, aligned, orig.n_channels)


def odg_region(nmr: float, anchors: dict) -> str:
    """Ordinal ODG-region interpolation: place `nmr` on the anchor ladder
    (NMR -> published ODG operating point, linear between neighbors)."""
    pts = sorted(((v, ANCHOR_ODG[b]) for b, v in anchors.items()))
    if nmr <= pts[0][0]:
        return "<= %.1f (at/under the %s anchor)" % (
            pts[0][1], "transparent")
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if nmr <= x1:
            t = (nmr - x0) / (x1 - x0) if x1 > x0 else 0.0
            return "~ %.1f" % (y0 + t * (y1 - y0))
    return ">= %.1f (beyond the lowest anchor)" % pts[-1][1]


# ---------------------------------------------------------------- main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=30)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "QUALITY.md"))
    args = ap.parse_args()

    from audiowmark_tpu.io.wavdata import WavData

    rows = {}
    anchors_by_carrier = {}
    wm_regions = {}
    failures = []
    with tempfile.TemporaryDirectory() as td:
        for carrier, gen in (("noise", gen_noise), ("music", gen_music)):
            src = os.path.join(td, carrier + ".wav")
            gen(src, args.seconds)
            orig = WavData.load(src)
            per = []
            for s in STRENGTHS:
                dst = os.path.join(td, "%s_s%d.wav" % (carrier, s))
                snr = add_with_snr(src, dst, s)
                marked = WavData.load(dst)
                nmr = nmr_db(orig.samples, marked.samples, orig.n_channels)
                per.append((s, snr, nmr))
                print("%-6s strength=%-3d snr=%7.3f dB  nmr=%7.3f dB"
                      % (carrier, s, snr, nmr), flush=True)
            rows[carrier] = per
            snr10 = dict((s, v) for s, v, _ in per)[10]
            nmr10 = dict((s, v) for s, _, v in per)[10]
            for (s1, v1, _), (s2, v2, _) in zip(per, per[1:]):
                if v2 < v1 - 0.1:        # weaker strength must raise SNR
                    failures.append("%s: SNR not monotone at %d->%d "
                                    "(%.2f -> %.2f)"
                                    % (carrier, s1, s2, v1, v2))
            if snr10 < 20.0:
                failures.append("%s: SNR at strength 10 = %.2f < 20 dB"
                                % (carrier, snr10))
            if nmr10 > 0.0:
                failures.append("%s: NMR at strength 10 = %.2f > 0 dB"
                                % (carrier, nmr10))

            # ---- calibration: mp3 bitrate ladder through the SAME model
            # (round-4 review missing #2: the proxy had never been checked
            # against any known quality operating point) ----
            anchors = {}
            for br in ANCHOR_BITRATES:
                anchors[br] = mp3_anchor_nmr(orig, br)
                print("%-6s mp3@%-3d anchor nmr=%7.3f dB"
                      % (carrier, br, anchors[br]), flush=True)
            anchors_by_carrier[carrier] = anchors
            ladder = [anchors[b] for b in sorted(ANCHOR_BITRATES,
                                                 reverse=True)]
            if not all(x < y + 0.1 for x, y in zip(ladder, ladder[1:])):
                failures.append(
                    "%s: anchor ladder not monotone (%s) — the NMR proxy "
                    "fails ordinal validation on known-ordered stimuli"
                    % (carrier, ["%.2f" % v for v in ladder]))
            # gate: on the noise carrier the mark must sit at/under the
            # TRANSPARENT mp3@256 anchor; on the deliberately worst-case
            # sparse tonal carrier it must stay clearly BELOW the mp3@64
            # 'clearly degraded' anchor — strength 10 trades some
            # audibility for robustness by design (the reference makes
            # no transparency claim either; src/peaq.sh measures ODG
            # without a gate), so the calibrated deliverable for hard
            # carriers is the ODG-region estimate in the table, and the
            # hard gate only rejects coding-noise-class audibility
            gate_br = 256 if carrier == "noise" else 64
            margin = 0.1 if gate_br == 256 else -10.0
            if nmr10 > anchors[gate_br] + margin:
                failures.append(
                    "%s: watermark strength 10 NMR %.2f exceeds the "
                    "mp3@%d anchor %.2f"
                    % (carrier, nmr10, gate_br, anchors[gate_br]))
            wm_regions[carrier] = odg_region(nmr10, anchors)
            print("%-6s strength-10 ODG-region estimate: %s"
                  % (carrier, wm_regions[carrier]), flush=True)

    lines = [
        "# Watermark quality report",
        "",
        "Generated %s by `tools/quality_report.py` (%d s fixtures, "
        "pattern `%s`)." % (datetime.date.today().isoformat(),
                            args.seconds, PATTERN),
        "",
        "Counterpart of the reference's `src/snr.sh` / `src/strength2snr.sh`"
        " (SNR from the production `add --snr` path) and `src/peaq.sh`"
        " (ODG needs the external GstPEAQ binary, absent here; the NMR"
        " column is a native Bark-band noise-to-mask proxy — negative"
        " means the watermark sits below the masked threshold).",
        "",
        "| strength | noise SNR dB | noise NMR dB | music SNR dB "
        "| music NMR dB |",
        "|---|---|---|---|---|",
    ]
    for i, s in enumerate(STRENGTHS):
        lines.append("| %d | %.3f | %.3f | %.3f | %.3f |"
                     % (s, rows["noise"][i][1], rows["noise"][i][2],
                        rows["music"][i][1], rows["music"][i][2]))
    lines += [
        "",
        "## NMR calibration against the MP3 bitrate ladder",
        "",
        "The proxy is validated ordinally on stimuli with known published "
        "quality ordering: stereo MP3 at >= 256 kbit/s sits in the "
        "transparent range (ODG ~ 0 .. -0.5), 128 kbit/s around "
        "'perceptible, not annoying' (ODG ~ -1 .. -2 on critical items), "
        "64 kbit/s clearly degraded (ODG <= -3).  Each anchor's coding "
        "noise is scored by the SAME Bark-NMR model as the watermark "
        "delta (time-aligned for codec delay); the ladder must be "
        "monotone, and the strength-10 watermark must score at/under the "
        "transparent mp3@256 anchor on noise and clearly below the "
        "mp3@64 degraded anchor on the worst-case tonal carrier.",
        "",
        "| carrier | " + " | ".join("mp3@%d NMR dB" % b
                                    for b in ANCHOR_BITRATES)
        + " | wm s10 NMR dB | wm s10 ODG-region |",
        "|---|" + "---|" * (len(ANCHOR_BITRATES) + 2),
    ]
    for carrier in rows:
        nmr10 = dict((s, v) for s, _, v in rows[carrier])[10]
        lines.append(
            "| %s | %s | %.3f | %s |"
            % (carrier,
               " | ".join("%.3f" % anchors_by_carrier[carrier][b]
                          for b in ANCHOR_BITRATES),
               nmr10, wm_regions[carrier]))
    lines += [
        "",
        "Checks: SNR monotone decreasing in strength; strength 10 keeps"
        " SNR >= 20 dB and NMR <= 0 dB on both carriers; the mp3 anchor"
        " ladder is NMR-monotone on both carriers (ordinal proxy"
        " validation); strength-10 NMR <= the transparent mp3@256 anchor"
        " on noise and >= 10 dB below the clearly-degraded mp3@64 anchor"
        " on the worst-case tonal carrier (the ODG-region column carries"
        " the calibrated estimate there).",
        "Result: **%s**" % ("PASS" if not failures else
                            "FAIL: " + "; ".join(failures)),
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote %s" % args.out)
    if failures:
        print("FAILURES:", *failures, sep="\n  ", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
