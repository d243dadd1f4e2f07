"""Streaming pipe / raw-format / wav-pipe / short-payload tests
(reference: tests/pipe-test.sh, raw-format-test.sh, wav-pipe-test.sh,
short-payload tests).

These run the CLI as real subprocesses with real pipes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.params import Params

MSG = "f0" * 16
CLI = [sys.executable, "-m", "audiowmark_tpu"]
ENV = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu",
           PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))


def run(args):
    Params.reset()
    return main(args)


@pytest.fixture(scope="module")
def noise_wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipes")
    path = str(d / "noise.wav")
    Params.reset()
    assert main(["test-gen-noise", path, "120", "44100"]) == 0
    return path


def _cli(args, stdin=None, stdout=None):
    return subprocess.run(CLI + args, stdin=stdin, stdout=stdout,
                          stderr=subprocess.DEVNULL, env=ENV, cwd="/root/repo")


@pytest.mark.slow
def test_pipe_roundtrip(noise_wav, tmp_path):
    """add to stdout | cmp from stdin (pipe-test.sh flavor)."""
    out_txt = str(tmp_path / "out.txt")
    p1 = subprocess.Popen(CLI + ["--strict", "add", noise_wav, "-", MSG],
                          stdout=subprocess.PIPE,
                          stderr=subprocess.DEVNULL, env=ENV, cwd="/root/repo")
    with open(out_txt, "w") as f:
        p2 = subprocess.Popen(CLI + ["--strict", "cmp", "-", MSG],
                              stdin=p1.stdout, stdout=f,
                              stderr=subprocess.DEVNULL, env=ENV,
                              cwd="/root/repo")
    p1.stdout.close()
    assert p2.wait(timeout=600) == 0
    assert p1.wait(timeout=60) == 0
    out = open(out_txt).read()
    assert "match_count" in out and "match_count 0" not in out


@pytest.mark.slow
def test_wav_pipe_roundtrip(noise_wav, tmp_path):
    """wav-pipe format: bogus length headers, read until EOF."""
    wm = str(tmp_path / "wm_pipe.wav")
    with open(wm, "wb") as f:
        p = subprocess.Popen(
            CLI + ["--strict", "add", "--output-format", "wav-pipe",
                   noise_wav, "-", MSG],
            stdout=f, stderr=subprocess.DEVNULL, env=ENV, cwd="/root/repo")
        assert p.wait(timeout=600) == 0
    # header should declare 0xFFFFFFFF sizes
    hdr = open(wm, "rb").read(44)
    assert hdr[4:8] == b"\xff\xff\xff\xff"
    rc = run(["--strict", "cmp", "--input-format", "wav-pipe", wm, MSG])
    assert rc == 0


def test_raw_format_roundtrip(noise_wav, tmp_path, capsys):
    """raw s16le round trip through add + cmp."""
    raw_in = str(tmp_path / "in.raw")
    # wav -> raw via our own converter path
    from audiowmark_tpu.io.wavdata import WavData
    from audiowmark_tpu.io.converters import RawConverter
    from audiowmark_tpu.params import RawFormat
    Params.reset()
    wav = WavData.load(noise_wav)
    fmt = RawFormat()
    fmt.set_sample_rate(44100)
    conv = RawConverter(fmt)
    open(raw_in, "wb").write(conv.to_raw(wav.samples))

    raw_out = str(tmp_path / "out.raw")
    rc = run(["--strict", "add", "--format", "raw", "--raw-rate", "44100",
              raw_in, raw_out, MSG])
    assert rc == 0
    assert os.path.getsize(raw_out) == os.path.getsize(raw_in)
    rc = run(["--strict", "cmp", "--input-format", "raw", "--raw-rate",
              "44100", raw_out, MSG])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "match_count 0" not in out


@pytest.mark.parametrize("encoding,bits", [
    ("signed", 16), ("signed", 24), ("signed", 32),
    ("unsigned", 8), ("unsigned", 16),
    ("float", 32), ("double", 64),
])
def test_raw_converter_roundtrip(encoding, bits):
    """All raw conversion paths (reference: testrawconverter.cc)."""
    from audiowmark_tpu.io.converters import RawConverter
    from audiowmark_tpu.params import Encoding, RawFormat
    for endian in (RawFormat.Endian.LITTLE, RawFormat.Endian.BIG):
        fmt = RawFormat()
        fmt.set_endian(endian)
        if encoding == "signed":
            fmt.set_encoding(Encoding.SIGNED)
            fmt.set_bit_depth(bits)
        elif encoding == "unsigned":
            fmt.set_encoding(Encoding.UNSIGNED)
            fmt.set_bit_depth(bits)
        elif encoding == "float":
            fmt.set_encoding(Encoding.FLOAT)
            fmt.set_bit_depth(32)
        else:
            fmt.set_encoding(Encoding.FLOAT)
            fmt.set_bit_depth(64)
        conv = RawConverter(fmt)
        rng = np.random.RandomState(bits)
        x = (rng.rand(1000).astype(np.float32) * 2 - 1) * 0.99
        raw = conv.to_raw(x)
        assert len(raw) == 1000 * fmt.bit_depth() // 8
        y = conv.from_raw(raw)
        tol = {8: 2 ** -7, 16: 2 ** -15, 24: 2 ** -23, 32: 1e-7, 64: 1e-7}
        np.testing.assert_allclose(y, x, atol=tol[fmt.bit_depth()])


@pytest.mark.slow
def test_short_payload(tmp_path, capsys):
    """12-bit short payload mode round trip."""
    noise = str(tmp_path / "n.wav")
    wm = str(tmp_path / "wm.wav")
    assert run(["test-gen-noise", noise, "120", "44100"]) == 0
    assert run(["--strict", "add", "--short", "12", noise, wm, "abc"]) == 0
    rc = run(["--strict", "cmp", "--short", "12", wm, "abc"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "abc" in out


def test_24bit_wav_roundtrip(tmp_path, capsys):
    """bit-depth preservation for 24-bit input (wav-pipe-test.sh flavor)."""
    from audiowmark_tpu.io.wavdata import WavData
    rng = np.random.RandomState(3)
    x = (rng.rand(44100 * 2).astype(np.float32) * 2 - 1) * 0.9
    src = str(tmp_path / "in24.wav")
    WavData(x, 2, 44100, 24).save(src)
    assert run(["test-info", src, "bit_depth"]) == 0
    assert int(capsys.readouterr().out.strip()) == 24

    wm = str(tmp_path / "wm24.wav")
    assert run(["add", src, wm, MSG]) == 0
    assert run(["test-info", wm, "bit_depth"]) == 0
    assert int(capsys.readouterr().out.strip()) == 24


def _info(path, what):
    out = subprocess.run(CLI + ["test-info", path, what],
                         capture_output=True, env=ENV, cwd="/root/repo")
    assert out.returncode == 0
    return int(out.stdout.decode().strip())


def _snr(orig, wm):
    out = subprocess.run(CLI + ["test-snr", orig, wm],
                         capture_output=True, env=ENV, cwd="/root/repo")
    assert out.returncode == 0
    return float(out.stdout.decode().strip())


@pytest.mark.slow
@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_pipe_triple_nested(tmp_path, bits):
    """Reference tests/wav-pipe-test.sh: three watermarks chained through
    wav-pipe stdin/stdout under keys 1/2/3 (--test-no-limiter), length
    preserved, SNR floors 32/29/27 dB, bit depth preserved, and (16-bit
    only, for runtime) each key finds its 5 matches while the wrong key
    finds 0."""
    src = str(tmp_path / "in.wav")
    assert run(["test-gen-noise", "--bits", str(bits), src,
                "200", "44100"]) == 0
    assert _info(src, "bit_depth") == bits

    outs = []
    prev = src
    for k in (1, 2, 3):
        out = str(tmp_path / ("out%d.wav" % k))
        with open(prev, "rb") as fi, open(out, "wb") as fo:
            p = _cli(["--strict", "add", "--test-key", str(k),
                      "--test-no-limiter", "--format", "wav-pipe",
                      "-", "-", MSG], stdin=fi, stdout=fo)
            assert p.returncode == 0, (bits, k)
        outs.append(out)
        prev = out

    n = _info(src, "frames")
    for out, floor in zip(outs, (32.0, 29.0, 27.0)):
        assert _info(out, "frames") == n
        assert _snr(src, out) >= floor
    assert _info(outs[2], "bit_depth") == bits

    if bits == 16:
        rc = run(["--strict", "cmp", "--expect-matches", "0",
                  "--input-format", "wav-pipe", outs[2], MSG])
        assert rc == 0                     # zero key: no matches
        for k in (1, 2, 3):
            rc = run(["--strict", "cmp", "--test-key", str(k),
                      "--expect-matches", "5", "--input-format", "wav-pipe",
                      outs[2], MSG])
            assert rc == 0, k
