"""WAV subformat coverage (reference: testwavformat.cc, wav-subformat-test.sh):
PCM 8/16/24/32, float32/64, extensible fmt, RF64."""

import struct

import numpy as np
import pytest

from audiowmark_tpu.io import wavfile
from audiowmark_tpu.io.wavdata import WavData
from audiowmark_tpu.params import Encoding, Params


@pytest.mark.parametrize("bits,enc", [
    (16, Encoding.SIGNED), (24, Encoding.SIGNED), (32, Encoding.SIGNED),
    (32, Encoding.FLOAT), (64, Encoding.FLOAT),
])
def test_write_read_roundtrip(tmp_path, bits, enc):
    rng = np.random.RandomState(bits)
    x = ((rng.rand(44100).astype(np.float32) * 2 - 1) * 0.9)
    path = str(tmp_path / "t.wav")
    with open(path, "wb") as f:
        w = wavfile.WavFileWriter(f, 2, 44100, bits, enc)
        w.write_frames(x)
        w.close()
    with open(path, "rb") as f:
        info = wavfile.parse_header(f)
        assert info.bit_depth == bits
        assert info.encoding == enc
        assert info.n_frames == x.size // 2
        y = wavfile.decode_samples(f.read(info.data_size), info)
    tol = {16: 2 ** -15, 24: 2 ** -23, 32: 1e-7, 64: 1e-7}[bits]
    np.testing.assert_allclose(y, x, atol=tol)


def test_pcm8_unsigned_read(tmp_path):
    """8-bit WAV is unsigned PCM."""
    raw = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    path = str(tmp_path / "u8.wav")
    open(path, "wb").write(data)
    with open(path, "rb") as f:
        info = wavfile.parse_header(f)
        assert info.bit_depth == 8
        assert info.encoding == Encoding.UNSIGNED
        y = wavfile.decode_samples(f.read(info.data_size), info)
    assert y[0] == pytest.approx(-1.0)
    assert abs(y[1]) < 0.01
    assert y[2] == pytest.approx(1.0, abs=0.01)


def test_extensible_fmt_read(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE with PCM subformat GUID."""
    raw = struct.pack("<4h", 0, 16384, -16384, 32767)
    guid = bytes.fromhex("0100000000001000800000aa00389b71")
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 2, 44100, 176400, 4, 16,
                      22, 16, 3) + guid
    data = (b"RIFF" + struct.pack("<I", 36 + len(fmt) - 16 + len(raw))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    path = str(tmp_path / "ext.wav")
    open(path, "wb").write(data)
    with open(path, "rb") as f:
        info = wavfile.parse_header(f)
        assert info.bit_depth == 16
        assert info.encoding == Encoding.SIGNED
        y = wavfile.decode_samples(f.read(info.data_size), info)
    np.testing.assert_allclose(y, [0.0, 0.5, -0.5, 32767 / 32768], atol=1e-6)


def test_rf64_write_read(tmp_path):
    """RF64 output (ds64 sizes) reads back correctly."""
    Params.reset()
    rng = np.random.RandomState(0)
    x = (rng.rand(44100 * 2).astype(np.float32) * 2 - 1) * 0.5
    path = str(tmp_path / "t.rf64"
               )
    with open(path, "wb") as f:
        w = wavfile.WavFileWriter(f, 2, 44100, 16, Encoding.SIGNED, rf64=True,
                                  expected_frames=x.size // 2)
        w.write_frames(x)
        w.close()
    head = open(path, "rb").read(4)
    assert head == b"RF64"
    with open(path, "rb") as f:
        info = wavfile.parse_header(f)
        assert info.n_frames == x.size // 2
        y = wavfile.decode_samples(f.read(info.data_size), info)
    np.testing.assert_allclose(y, x, atol=2 ** -15)


def test_unknown_chunks_skipped(tmp_path):
    raw = struct.pack("<2h", 100, -100)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"JUNK" + struct.pack("<I", 7) + b"junkbyt\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", 4) + b"info"
            + b"data" + struct.pack("<I", len(raw)) + raw)
    path = str(tmp_path / "junk.wav")
    open(path, "wb").write(data)
    with open(path, "rb") as f:
        info = wavfile.parse_header(f)
        y = wavfile.decode_samples(f.read(info.data_size), info)
    assert y.size == 2
