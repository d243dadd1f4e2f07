"""Ogg/Vorbis input: decode, factory auto-detect, and the headline
robustness claim — a watermark survives Ogg >=128 kbit/s
(reference: README.adoc:11-13, src/sfinputstream.cc:137-144)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from audiowmark_tpu.io import vorbis
from audiowmark_tpu.io.streams import create_input_stream
from audiowmark_tpu.io.wavdata import WavData

pytestmark = pytest.mark.skipif(not vorbis.available(),
                                reason="vorbis libraries not available")


def _tone(seconds=2.0, rate=44100, channels=2):
    t = np.arange(int(seconds * rate)) / rate
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1200 * t)
    return np.repeat(x, channels).astype(np.float32)


def test_roundtrip_exact_length(tmp_path):
    samples = _tone()
    path = tmp_path / "t.ogg"
    path.write_bytes(vorbis.encode_vorbis(samples, 2, 44100, quality=0.4))
    s = vorbis.OggVorbisInputStream(str(path))
    assert (s.sample_rate(), s.n_channels(), s.bit_depth()) == (44100, 2, 24)
    assert s.n_frames() == samples.size // 2
    got = []
    while True:
        c = s.read_frames(4000)
        if c.size == 0:
            break
        got.append(c)
    s.close()
    dec = np.concatenate(got)
    assert dec.size == samples.size
    corr = float(np.dot(dec, samples)
                 / (np.linalg.norm(dec) * np.linalg.norm(samples)))
    assert corr > 0.99, corr


def test_factory_autodetect(tmp_path):
    path = tmp_path / "t.ogg"
    path.write_bytes(vorbis.encode_vorbis(_tone(0.5), 2, 44100))
    s = create_input_stream(str(path))
    assert isinstance(s, vorbis.OggVorbisInputStream)
    s.close()


def test_detect_rejects_non_ogg(tmp_path):
    junk = tmp_path / "x.bin"
    junk.write_bytes(b"OggS" + os.urandom(512))   # magic but not a stream
    assert not vorbis.ogg_detect(str(junk))
    wav = tmp_path / "x.wav"
    WavData(_tone(0.2), 2, 44100, 16).save(str(wav))
    assert not vorbis.ogg_detect(str(wav))


def test_managed_bitrate_mode(tmp_path):
    data = vorbis.encode_vorbis(_tone(1.0), 2, 44100, bitrate_kbps=128)
    path = tmp_path / "b.ogg"
    path.write_bytes(data)
    s = vorbis.OggVorbisInputStream(str(path))
    assert s.n_frames() == 44100
    s.close()


@pytest.mark.slow
def test_watermark_survives_ogg(tmp_path):
    """add -> vorbis 128 kbps -> get via auto-detected Ogg input
    (README.adoc:11-13 robustness floor)."""
    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wav = tmp_path / "n.wav"
    wm = tmp_path / "wm.wav"
    ogg = tmp_path / "wm.ogg"
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
    ogg.write_bytes(vorbis.encode_vorbis(w.samples, w.n_channels,
                                         w.sample_rate, bitrate_kbps=128))
    out = run("get", str(ogg))
    assert payload in out, out
