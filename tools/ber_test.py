#!/usr/bin/env python3
"""Bit-error-rate / frame-error-rate robustness suite.

Python equivalent of the reference's ber-test.sh / fer-test.sh harnesses:
for each input file and each random payload, embed, optionally run a lossy
transform (mp3/ogg/opus/aac codecs, resample, speed change), decode, and
report per-pattern bit error rates and the frame (payload) error rate.

    python tools/ber_test.py <wav...> [--seeds N] [--strength S]
                             [--transform none|mp3:BITRATE|ogg:BITRATE|
                              opus:BITRATE|aac:BITRATE|
                              resample:RATE|speed:FACTOR|
                              double-mp3:B1:B2|speed-mp3:FACTOR:BITRATE|
                              trunc:SECONDS|clip:SECONDS]

All transforms run on the native codec bindings (no external tools):
libmp3lame, libvorbisenc, and the libav shim for opus/aac.  The harder
rows mirror the reference's attack generators: double-mp3
(src/ber-double-mp3.sh), speed-then-codec (src/gen-speed-mk.sh, decoded
with --detect-speed), truncation (src/gen-trunc-mk.sh) and short clips
(src/gen-short-clip-mk.sh).
"""

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from audiowmark_tpu.cli import main as cli_main  # noqa: E402
from audiowmark_tpu.params import Params  # noqa: E402
from audiowmark_tpu.utils.hexbits import bit_str_to_vec  # noqa: E402


def run_cli(args):
    Params.reset()
    return cli_main(args)


def _mp3_roundtrip(samples, n_channels, rate, bitrate):
    """encode at `bitrate` and decode back via the autodetecting stream
    factory (libmpg123 underneath)."""
    import tempfile as _tf

    from audiowmark_tpu.io.lame import encode_mp3
    from audiowmark_tpu.io.wavdata import WavData
    data = encode_mp3(samples, n_channels, rate, bitrate)
    with _tf.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
        f.write(data)
        name = f.name
    try:
        return WavData.load(name)
    finally:
        os.remove(name)


def transform(kind, src, dst, rng=None):
    if kind == "none":
        shutil.copy(src, dst)
        return
    if kind.startswith("double-mp3:"):
        # mp3 -> decode -> mp3 again (src/ber-double-mp3.sh: generational
        # transcode; two lossy passes compound the spectral damage)
        from audiowmark_tpu.io.lame import encode_mp3
        from audiowmark_tpu.io.wavdata import WavData
        _, b1, b2 = kind.split(":")
        w = WavData.load(src)
        w2 = _mp3_roundtrip(w.samples, w.n_channels, w.sample_rate, int(b1))
        with open(dst, "wb") as f:
            f.write(encode_mp3(w2.samples, w2.n_channels, w2.sample_rate,
                               int(b2)))
        return
    if kind.startswith("speed-mp3:"):
        # speed change then mp3 (src/gen-speed-mk.sh matrices); the decode
        # side must recover the speed first (--detect-speed)
        from audiowmark_tpu.io.lame import encode_mp3
        from audiowmark_tpu.io.wavdata import WavData
        _, factor, bitrate = kind.split(":")
        mid = dst + ".speed.wav"
        assert run_cli(["test-change-speed", src, mid, factor]) == 0
        w = WavData.load(mid)
        os.remove(mid)
        with open(dst, "wb") as f:
            f.write(encode_mp3(w.samples, w.n_channels, w.sample_rate,
                               int(bitrate)))
        return
    if kind.startswith("trunc:"):
        # keep only the first N seconds (src/gen-trunc-mk.sh)
        from audiowmark_tpu.io.wavdata import WavData
        secs = float(kind.split(":")[1])
        w = WavData.load(src)
        n = int(secs * w.sample_rate) * w.n_channels
        w.set_samples(w.samples[:n])
        w.save(dst)
        return
    if kind.startswith("clip:"):
        # random N-second excerpt (src/gen-short-clip-mk.sh uses a random
        # start per seed; rng comes from the harness for determinism)
        from audiowmark_tpu.io.wavdata import WavData
        secs = float(kind.split(":")[1])
        w = WavData.load(src)
        n = int(secs * w.sample_rate) * w.n_channels
        lo = max(w.samples.size - n, 0)
        start = (int(rng.randint(0, lo // w.n_channels + 1))
                 * w.n_channels if rng is not None and lo else 0)
        w.set_samples(w.samples[start:start + n])
        w.save(dst)
        return
    if kind.startswith("resample:"):
        rate = kind.split(":")[1]
        assert run_cli(["test-resample", src, dst, rate]) == 0
        return
    if kind.startswith("speed:"):
        factor = kind.split(":")[1]
        assert run_cli(["test-change-speed", src, dst, factor]) == 0
        return
    if kind.startswith("mp3:"):
        # native libmp3lame encode (reference attack: lame -b N,
        # src/ber-mp3.sh); decode auto-detects MP3 input via libmpg123
        from audiowmark_tpu.io.lame import encode_mp3
        from audiowmark_tpu.io.wavdata import WavData
        bitrate = int(kind.split(":")[1])
        w = WavData.load(src)
        with open(dst, "wb") as f:
            f.write(encode_mp3(w.samples, w.n_channels, w.sample_rate,
                               bitrate))
        return
    if kind.startswith("ogg:"):
        # native libvorbisenc managed-bitrate encode (reference attack:
        # oggenc -b N, src/ber-ogg.sh)
        from audiowmark_tpu.io.vorbis import encode_vorbis
        from audiowmark_tpu.io.wavdata import WavData
        bitrate = int(kind.split(":")[1])
        w = WavData.load(src)
        with open(dst, "wb") as f:
            f.write(encode_vorbis(w.samples, w.n_channels, w.sample_rate,
                                  bitrate_kbps=bitrate))
        return
    if kind.startswith("opus:") or kind.startswith("aac:"):
        # libav-shim encodes (the reference's ber harness attacks through
        # whatever codecs its tools provide, src/ber-test.sh)
        from audiowmark_tpu.io import ffshim
        from audiowmark_tpu.io.wavdata import WavData
        name, bitrate = kind.split(":")
        w = WavData.load(src)
        fmt, codec = (("ogg", "libopus") if name == "opus"
                      else ("adts", "aac"))
        ffshim.encode_file(dst, fmt, codec, w.samples, w.n_channels,
                           w.sample_rate, int(bitrate) * 1000)
        return
    raise SystemExit("unknown transform %r" % kind)


def decode_patterns(wav, extra_args=()):
    """Run cmp-like decode, capture pattern lines."""
    import contextlib
    import io
    Params.reset()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(["get", wav] + list(extra_args))
    patterns = []
    for line in buf.getvalue().splitlines():
        parts = line.split()
        if parts and parts[0] == "pattern":
            patterns.append(parts[2])
    return patterns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--strength", default="10")
    ap.add_argument("--transform", default="none")
    args = ap.parse_args()

    rng = np.random.RandomState(42)
    total_bits = 0
    error_bits = 0
    frames = 0
    frame_errors = 0

    with tempfile.TemporaryDirectory() as tmpdir:
        for infile in args.inputs:
            for seed in range(args.seeds):
                msg_bits = rng.randint(0, 2, 128)
                msg = "".join("%x" % int("".join(map(str, msg_bits[i:i + 4])), 2)
                              for i in range(0, 128, 4))
                wm = os.path.join(tmpdir, "wm.wav")
                ext = {"mp3": ".mp3", "ogg": ".ogg", "opus": ".opus",
                       "aac": ".aac", "double-mp3": ".mp3",
                       "speed-mp3": ".mp3"}.get(
                    args.transform.split(":")[0], ".wav")
                attacked = os.path.join(tmpdir, "attacked" + ext)
                assert run_cli(["-q", "add", "--strength", args.strength,
                                infile, wm, msg]) == 0
                transform(args.transform, wm, attacked, rng=rng)

                extra = (["--detect-speed"]
                         if args.transform.startswith("speed-mp3:") else [])
                patterns = decode_patterns(attacked, extra)
                frames += 1
                if not patterns:
                    frame_errors += 1
                    total_bits += 128
                    error_bits += 128  # count a lost frame as all-wrong
                    continue
                best = min(
                    patterns,
                    key=lambda p: int(np.sum(np.array(bit_str_to_vec(p))
                                             != msg_bits)))
                errs = int(np.sum(np.array(bit_str_to_vec(best)) != msg_bits))
                total_bits += 128
                error_bits += errs
                if errs:
                    frame_errors += 1

    print("transform=%s strength=%s files=%d seeds=%d"
          % (args.transform, args.strength, len(args.inputs), args.seeds))
    print("ber %.6f (%d/%d)" % (error_bits / max(total_bits, 1),
                                error_bits, total_bits))
    print("fer %.6f (%d/%d)" % (frame_errors / max(frames, 1),
                                frame_errors, frames))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
