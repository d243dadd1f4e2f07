"""End-to-end CLI tests mirroring the reference shell suite (tests/*.sh):
block decoder, SNR floors, key separation, sync re-alignment after cuts,
test-no-sync determinism, length preservation."""

import os

import numpy as np
import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.params import Params

MSG = "f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0"
MSG2 = "5577" * 8
MSG3 = "aa" * 16


def run(args, capsys=None):
    """Run one CLI invocation with fresh Params (each real invocation is a
    fresh process)."""
    Params.reset()
    return main(args)


@pytest.fixture(scope="module")
def noise_wav(tmp_path_factory):
    """200 s of deterministic noise (3 full blocks; clip decoder stays off)."""
    d = tmp_path_factory.mktemp("audio")
    path = str(d / "test.wav")
    Params.reset()
    assert main(["test-gen-noise", path, "200", "44100"]) == 0
    return path


@pytest.fixture(scope="module")
def marked_wav(noise_wav, tmp_path_factory):
    d = tmp_path_factory.mktemp("marked")
    path = str(d / "marked.wav")
    Params.reset()
    assert main(["--strict", "add", noise_wav, path, MSG]) == 0
    return path


def test_gen_noise_deterministic(tmp_path):
    a = str(tmp_path / "a.wav")
    b = str(tmp_path / "b.wav")
    assert run(["test-gen-noise", a, "2", "44100"]) == 0
    assert run(["test-gen-noise", b, "2", "44100"]) == 0
    assert open(a, "rb").read() == open(b, "rb").read()


def test_length_preserved(noise_wav, marked_wav, capsys):
    assert run(["test-info", noise_wav, "frames"], capsys) == 0
    frames_in = int(capsys.readouterr().out.strip())
    assert run(["test-info", marked_wav, "frames"], capsys) == 0
    frames_out = int(capsys.readouterr().out.strip())
    assert frames_in == frames_out == 200 * 44100


def test_bit_depth_preserved(marked_wav, capsys):
    assert run(["test-info", marked_wav, "bit_depth"]) == 0
    assert int(capsys.readouterr().out.strip()) == 16


def test_block_decoder(noise_wav, tmp_path, capsys):
    """block-decoder-test.sh: add + cmp with --test-no-limiter, SNR floor."""
    wm = str(tmp_path / "wm.wav")
    assert run(["--strict", "add", "--test-no-limiter", noise_wav, wm, MSG]) == 0

    assert run(["test-snr", noise_wav, wm]) == 0
    snr = float(capsys.readouterr().out.strip())
    # the reference's exact floor (tests/block-decoder-test.sh:18);
    # measured 32.428 dB on this path
    assert snr >= 32.4, snr

    # 200 s: blocks A, B, A -> patterns A, B, A, AB, all = 5 matches
    rc = run(["--strict", "cmp", "--expect-matches", "5", wm, MSG])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0


def test_cmp_with_limiter(marked_wav, capsys):
    rc = run(["--strict", "cmp", "--expect-matches", "5", marked_wav, MSG])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0


def test_wrong_key_no_matches(marked_wav, capsys):
    """key-test.sh: wrong key => 0 matches."""
    rc = run(["--strict", "cmp", "--test-key", "1", "--expect-matches", "0",
              marked_wav, MSG])
    out = capsys.readouterr().out
    assert "match_count 0" in out, out
    assert rc == 0


def test_keyed_add_and_get(noise_wav, tmp_path, capsys):
    wm = str(tmp_path / "wm_key.wav")
    assert run(["--strict", "add", "--test-key", "7", noise_wav, wm, MSG2]) == 0
    rc = run(["--strict", "cmp", "--test-key", "7", "--expect-matches", "5",
              wm, MSG2])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0


def test_sync_cut(marked_wav, tmp_path, capsys):
    """sync-test.sh flavor: cut samples from the start, re-find blocks."""
    cut = str(tmp_path / "cut.wav")
    assert run(["cut-start", marked_wav, cut, "882300"]) == 0
    rc = run(["--strict", "cmp", "--expect-matches", "3", cut, MSG])
    out = capsys.readouterr().out
    assert "match_count 3" in out, out
    assert rc == 0


def test_no_sync_mode(marked_wav, capsys):
    """--test-no-sync: fake sync at exact expected positions."""
    rc = run(["--strict", "cmp", "--test-no-sync", "--expect-matches", "5",
              marked_wav, MSG])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0


def test_json_output(marked_wav, tmp_path, capsys):
    import json
    json_file = str(tmp_path / "out.json")
    rc = run(["--strict", "cmp", "--json", json_file, marked_wav, MSG])
    assert rc == 0
    capsys.readouterr()
    data = json.load(open(json_file))
    assert data["length"] == "3:20"
    bits = [m["bits"] for m in data["matches"]]
    assert "f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0" in bits
    types = {m["type"] for m in data["matches"]}
    assert {"A", "B", "AB", "ALL"} <= types


def test_gen_key_and_use(tmp_path, noise_wav, capsys):
    key_file = str(tmp_path / "k.key")
    assert run(["gen-key", key_file, "--name", "testkey"]) == 0
    content = open(key_file).read()
    assert content.startswith("# watermarking key for audiowmark")
    assert 'name "testkey"' in content

    wm = str(tmp_path / "wm.wav")
    assert run(["--strict", "add", "--key", key_file, noise_wav, wm, MSG3]) == 0
    rc = run(["--strict", "cmp", "--key", key_file, "--expect-matches", "5",
              wm, MSG3])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0


def test_version(capsys):
    assert run(["--version"]) == 0
    assert "audiowmark" in capsys.readouterr().out
