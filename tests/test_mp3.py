"""MP3 input: libmpg123 decode, detect semantics, and watermark survival
through an MP3 encode attack (reference: src/mp3inputstream.cc and the
ber-mp3.sh robustness harness)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from audiowmark_tpu.io import lame, mpg123
from audiowmark_tpu.io.mp3 import MP3InputStream, mp3_detect
from audiowmark_tpu.io.wavdata import WavData

pytestmark = pytest.mark.skipif(
    not (mpg123.available() and lame.available()),
    reason="libmpg123/libmp3lame not available")


def _tone(seconds=2.0, rate=44100, channels=2):
    t = np.arange(int(seconds * rate)) / rate
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1200 * t)
    return np.repeat(x, channels).astype(np.float32)


@pytest.fixture()
def mp3_file(tmp_path):
    samples = _tone()
    path = tmp_path / "t.mp3"
    path.write_bytes(lame.encode_mp3(samples, 2, 44100, 128))
    return str(path), samples


def test_detect(mp3_file, tmp_path):
    path, _ = mp3_file
    assert mp3_detect(path)
    wav = tmp_path / "t.wav"
    WavData(_tone(0.5), 2, 44100, 16).save(str(wav))
    assert not mp3_detect(str(wav))
    junk = tmp_path / "junk.bin"
    junk.write_bytes(os.urandom(4096))
    assert not mp3_detect(str(junk))


def test_decode_matches_source(mp3_file):
    path, samples = mp3_file
    s = MP3InputStream(path)
    assert s.sample_rate() == 44100
    assert s.n_channels() == 2
    assert s.bit_depth() == 24
    n = s.n_frames()
    assert n is not None and n > 0
    got = []
    while True:
        chunk = s.read_frames(1024)
        if chunk.size == 0:
            break
        got.append(chunk)
    s.close()
    dec = np.concatenate(got)
    assert dec.size == n * 2

    # gapless-aligned decode should correlate strongly with the source tone
    m = min(dec.size, samples.size)
    a, b = dec[:m], samples[:m]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert corr > 0.95, corr


def test_read_frames_promised_count(mp3_file):
    """Reads must deliver exactly the scanned length, zero-padding if the
    decoder runs dry (src/mp3inputstream.cc:145-151)."""
    path, _ = mp3_file
    s = MP3InputStream(path)
    n = s.n_frames()
    total = 0
    while True:
        chunk = s.read_frames(4096)
        if chunk.size == 0:
            break
        total += chunk.size // 2
    s.close()
    assert total == n


def test_detect_short_valid(tmp_path):
    """A valid MP3 shorter than the 30-frame probe IS detected: the
    reference returns true on MPG123_DONE before the 30 reads complete
    (src/mp3inputstream.cc:262-266)."""
    samples = _tone(0.3)  # ~11 frames
    path = tmp_path / "short.mp3"
    path.write_bytes(lame.encode_mp3(samples, 2, 44100, 128))
    assert mp3_detect(str(path))


@pytest.mark.slow
def test_watermark_survives_mp3(tmp_path):
    """add -> lame 128 kbps -> get via auto-detected MP3 input finds the
    watermark (the reference's headline robustness claim, README.adoc:11)."""
    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wav = tmp_path / "n.wav"
    wm = tmp_path / "wm.wav"
    mp3 = tmp_path / "wm.mp3"
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
    mp3.write_bytes(lame.encode_mp3(w.samples, w.n_channels,
                                    w.sample_rate, 128))
    out = run("get", str(mp3))
    assert payload in out, out
