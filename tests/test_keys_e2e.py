"""Key separation and double-watermark tests (reference: tests/key-test.sh)."""

import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.params import Params

MSG = "f0" * 16
MSG2 = "0123456789abcdef0123456789abcdef"


def run(args):
    Params.reset()
    return main(args)


@pytest.fixture(scope="module")
def noise30(tmp_path_factory):
    d = tmp_path_factory.mktemp("keys")
    path = str(d / "noise.wav")
    Params.reset()
    assert main(["test-gen-noise", path, "30", "44100"]) == 0
    return path


@pytest.mark.slow
def test_generated_keys_separate(noise30, tmp_path, capsys):
    key1 = str(tmp_path / "k1.key")
    key2 = str(tmp_path / "k2.key")
    out1 = str(tmp_path / "o1.wav")
    assert run(["gen-key", key1]) == 0
    assert run(["gen-key", key2]) == 0
    assert run(["--strict", "add", "--key", key1, noise30, out1, MSG]) == 0

    rc = run(["--strict", "cmp", "--key", key1, "--expect-matches", "1",
              out1, MSG])
    capsys.readouterr()
    assert rc == 0
    rc = run(["--strict", "cmp", "--key", key2, "--expect-matches", "0",
              out1, MSG])
    capsys.readouterr()
    assert rc == 0
    rc = run(["--strict", "cmp", "--expect-matches", "0", out1, MSG])
    capsys.readouterr()
    assert rc == 0


@pytest.mark.slow
def test_double_watermark_two_keys(noise30, tmp_path, capsys):
    out1 = str(tmp_path / "o1.wav")
    out2 = str(tmp_path / "o2.wav")
    assert run(["--strict", "add", noise30, out1, MSG]) == 0
    assert run(["--strict", "add", "--test-key", "42", out1, out2, MSG2]) == 0

    rc = run(["--strict", "cmp", "--expect-matches", "1", out2, MSG])
    capsys.readouterr()
    assert rc == 0
    rc = run(["--strict", "cmp", "--test-key", "42", "--expect-matches", "1",
              out2, MSG2])
    capsys.readouterr()
    assert rc == 0


@pytest.mark.slow
def test_multi_key_get(noise30, tmp_path, capsys):
    """get with multiple --test-key options reports per-key results."""
    out1 = str(tmp_path / "o1.wav")
    out2 = str(tmp_path / "o2.wav")
    assert run(["--strict", "add", "--test-key", "1", noise30, out1, MSG]) == 0
    assert run(["--strict", "add", "--test-key", "2", out1, out2, MSG2]) == 0
    rc = run(["cmp", "--test-key", "1", "--test-key", "2", out2, MSG])
    out = capsys.readouterr().out
    assert rc == 0
    assert "key test-key-1" in out and "key test-key-2" in out
    assert MSG in out and MSG2 in out
