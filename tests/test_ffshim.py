"""Native libav shim: Opus/ALAC/AAC input decode, factory auto-detect,
stream probe, the HLS AAC segment writer, and watermark survival through
the codecs the reference reads via libsndfile
(reference: src/sfinputstream.cc:75-149, src/hlsoutputstream.cc)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from audiowmark_tpu.io import ffshim
from audiowmark_tpu.io.streams import create_input_stream
from audiowmark_tpu.io.wavdata import WavData

pytestmark = pytest.mark.skipif(not ffshim.available(),
                                reason="libffshim.so not built")


def _noise(seconds=2.0, rate=44100, channels=2, seed=11):
    rng = np.random.default_rng(seed)
    n = int(seconds * rate) * channels
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _chirp(n_frames, rate=44100, channels=2):
    """Linear 200->4000 Hz sweep: AAC preserves it well and its
    autocorrelation is sharply peaked, so it pins down frame alignment
    (white noise gets waveform-scrambled by perceptual codecs)."""
    t = np.arange(n_frames) / rate
    f0, f1 = 200.0, 4000.0
    k = (f1 - f0) / t[-1]
    x = 0.4 * np.sin(2 * np.pi * (f0 * t + 0.5 * k * t * t))
    return np.repeat(x, channels).astype(np.float32)


def _read_all(stream, chunk=4000):
    got = []
    while True:
        c = stream.read_frames(chunk)
        if c.size == 0:
            break
        got.append(c)
    return np.concatenate(got) if got else np.zeros(0, np.float32)


def _corr(a, b):
    n = min(a.size, b.size)
    a, b = a[:n], b[:n]
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_alac_roundtrip_lossless(tmp_path):
    samples = _noise()
    path = str(tmp_path / "t.m4a")
    ffshim.encode_file(path, "ipod", "alac", samples, 2, 44100)
    s = ffshim.FFInputStream(path)
    assert (s.sample_rate(), s.n_channels()) == (44100, 2)
    assert s.codec_name == "alac"
    dec = _read_all(s)
    s.close()
    assert dec.size == samples.size
    # alac encodes 16/24-bit PCM: lossless up to quantization
    assert np.max(np.abs(dec - samples)) < 2.0 / (1 << 16)


def test_opus_roundtrip(tmp_path):
    samples = _noise()
    path = str(tmp_path / "t.opus")
    assert ffshim.encoder_rate("libopus", 44100) == 48000
    ffshim.encode_file(path, "ogg", "libopus", samples, 2, 44100, 128000)
    s = ffshim.FFInputStream(path)
    assert (s.sample_rate(), s.n_channels(), s.bit_depth()) == (48000, 2, 24)
    assert s.codec_name == "opus"
    dec = _read_all(s)
    s.close()
    # 44100*2s resampled to 48k
    assert abs(dec.size // 2 - 96000) < 480


def test_aac_adts_roundtrip(tmp_path):
    samples = _chirp(88200)
    path = str(tmp_path / "t.aac")
    ffshim.encode_file(path, "adts", "aac", samples, 2, 44100, 192000)
    s = ffshim.FFInputStream(path)
    assert s.codec_name == "aac"
    dec = _read_all(s)
    s.close()
    # ADTS carries no edit list: decode includes the encoder's one
    # 1024-sample priming frame (and trailing padding)
    assert dec.size >= samples.size
    assert _corr(dec[1024 * 2:], samples) > 0.9
    assert _corr(dec, samples) < 0.5   # unshifted is misaligned


def test_factory_autodetect_opus_alac(tmp_path):
    samples = _noise(0.5)
    opus = str(tmp_path / "a.opus")
    m4a = str(tmp_path / "a.m4a")
    ffshim.encode_file(opus, "ogg", "libopus", samples, 2, 44100, 96000)
    ffshim.encode_file(m4a, "ipod", "alac", samples, 2, 44100)
    for path, codec in ((opus, "opus"), (m4a, "alac")):
        s = create_input_stream(path)
        assert isinstance(s, ffshim.FFInputStream), path
        assert s.codec_name == codec
        s.close()


def test_probe_reports_stream_parameters(tmp_path):
    path = str(tmp_path / "t.ts")
    ffshim.encode_file(path, "mpegts", "aac", _noise(1.0), 2, 44100, 128000)
    p = ffshim.probe(path)
    assert p["codec_name"] == "aac"
    assert p["channels"] == "2"
    assert p["channel_layout"] == "stereo"
    assert p["sample_rate"] == "44100"
    assert float(p["start_time"]) >= 0.0
    assert p["nb_streams"] == "1"


def test_hls_segment_writer_cut_keep_window(tmp_path):
    """The writer must emit exactly keep_aac_frames 1024-sample AAC frames
    whose content starts at the cut boundary (reference pts bookkeeping,
    src/hlsoutputstream.cc + src/hls.cc:262-266)."""
    rate, ch = 44100, 2
    cut_frames, keep_frames = 3, 40
    total = (cut_frames + keep_frames + 5) * 1024
    pcm = _chirp(total)

    path = str(tmp_path / "seg.ts")
    w = ffshim.HLSSegmentWriter(path, rate, ch, 192000, cut_frames,
                                keep_frames, pts_start=1.5)
    for pos in range(0, total, 4096):   # streamed writes
        w.write(pcm[pos * ch:(pos + 4096) * ch])
    w.close()

    dec, dch, drate = ffshim.decode_file(path)
    assert (dch, drate) == (ch, rate)
    assert dec.size == keep_frames * 1024 * ch

    # content alignment: decoded segment ~= input from the cut point
    # (skip the first AAC frame: it lacks its overlap-add predecessor)
    want = pcm[cut_frames * 1024 * ch:(cut_frames + keep_frames) * 1024 * ch]
    skip = 1024 * ch
    assert _corr(dec[skip:], want[skip:]) > 0.9
    # and clearly NOT aligned to the uncut start
    assert _corr(dec[skip:], pcm[skip:dec.size]) < 0.5

    # the TS carries the requested presentation offset
    p = ffshim.probe(path)
    assert abs(float(p["start_time"]) - 1.5) < 0.05


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["opus", "alac", "aac"])
def test_watermark_survives_codec(tmp_path, kind):
    """add -> encode -> get via the auto-detected libav input
    (the reference's robustness targets, README.adoc:11-13)."""
    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wav = tmp_path / "n.wav"
    wm = tmp_path / "wm.wav"
    payload = "0123456789abcdef0011223344556677"

    def run(*args):
        r = subprocess.run([sys.executable, os.path.join(repo, "audiowmark")]
                           + list(args), env=env, capture_output=True,
                           text=True, cwd=repo)
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    run("test-gen-noise", str(wav), "60", "44100")
    run("add", str(wav), str(wm), payload)
    w = WavData.load(str(wm))
    if kind == "opus":
        out_path = str(tmp_path / "wm.opus")
        ffshim.encode_file(out_path, "ogg", "libopus", w.samples,
                           w.n_channels, w.sample_rate, 128000)
    elif kind == "alac":
        out_path = str(tmp_path / "wm.m4a")
        ffshim.encode_file(out_path, "ipod", "alac", w.samples,
                           w.n_channels, w.sample_rate)
    else:
        out_path = str(tmp_path / "wm.aac")
        ffshim.encode_file(out_path, "adts", "aac", w.samples,
                           w.n_channels, w.sample_rate, 192000)
    out = run("get", out_path)
    assert payload in out, out
