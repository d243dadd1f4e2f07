"""ResultSet ordering/merge/rating and WavChunkLoader mechanics."""

import numpy as np
import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.codec.convcode import ConvBlockType
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.models.chunkloader import WavChunkLoader
from audiowmark_tpu.models.resultset import PatternType, ResultSet
from audiowmark_tpu.params import Params


def _key(n):
    k = Key()
    k.set_test_key(n)
    return k


def test_resultset_rating_and_sort(capsys):
    rs = ResultSet()
    k = _key(1)
    bits_a = [1, 0, 1, 0] * 8
    bits_b = [0, 0, 0, 0] * 8
    rs.add_pattern(k, 10.0, 1.2, ConvBlockType.a, bits_a, 0.1,
                   PatternType.BLOCK, 1)
    rs.add_pattern(k, 62.0, 1.1, ConvBlockType.b, bits_a, 0.1,
                   PatternType.BLOCK, 1)
    rs.add_pattern(k, 30.0, 0.3, ConvBlockType.a, bits_b, 0.4,
                   PatternType.BLOCK, 1)
    rs.add_pattern(k, 0.0, 1.15, ConvBlockType.ab, bits_a, 0.05,
                   PatternType.ALL, 1)
    rs.sort([k])
    # rating of bits_a = 1.2+1.1+ 2*1.15 = 4.6 > rating of bits_b
    assert rs.patterns[0].rating == pytest.approx(4.6)
    # within same rating: non-ALL first, then by time
    kinds = [(p.type, p.time) for p in rs.patterns[:3]]
    assert kinds == [(PatternType.BLOCK, 10.0), (PatternType.BLOCK, 62.0),
                     (PatternType.ALL, 0.0)]
    assert rs.patterns[-1].bit_vec == bits_b


def test_resultset_merge_dedupes():
    bits = [1] * 32
    a = ResultSet()
    k = _key(2)
    a.add_pattern(k, 10.0, 1.0, ConvBlockType.a, bits, 0.1,
                  PatternType.BLOCK, 1)
    b = ResultSet()
    # same pattern within one frame of time -> deduped
    b.add_pattern(k, 10.01, 1.0, ConvBlockType.a, bits, 0.1,
                  PatternType.BLOCK, 1)
    # different block type -> kept
    b.add_pattern(k, 10.01, 1.0, ConvBlockType.b, bits, 0.1,
                  PatternType.BLOCK, 1)
    a.merge(b)
    assert len(a.patterns) == 2


def test_resultset_time_offset():
    rs = ResultSet()
    rs.add_pattern(_key(3), 5.0, 1.0, ConvBlockType.a, [0] * 32, 0.1,
                   PatternType.BLOCK, 1)
    rs.apply_time_offset(1800.0)
    assert rs.patterns[0].time == 1805.0


def test_chunk_loader_single_chunk(tmp_path):
    noise = str(tmp_path / "n.wav")
    Params.reset()
    assert main(["test-gen-noise", noise, "10", "44100"]) == 0
    loader = WavChunkLoader(noise)
    chunks = []
    while not loader.done():
        loader.load_next_chunk()
        if not loader.done():
            chunks.append(loader.wav_data().n_values)
            assert loader.time_offset() == 0.0
    assert chunks == [10 * 44100 * 2]
    assert loader.length() == pytest.approx(10.0)


def test_chunk_loader_resamples(tmp_path):
    noise = str(tmp_path / "n32.wav")
    Params.reset()
    assert main(["test-gen-noise", noise, "5", "32000"]) == 0
    loader = WavChunkLoader(noise)
    loader.load_next_chunk()
    wav = loader.wav_data()
    assert wav.sample_rate == 44100
    assert wav.n_frames == pytest.approx(5 * 44100, abs=50)


def test_chunk_loader_truncate(tmp_path):
    noise = str(tmp_path / "n.wav")
    Params.reset()
    assert main(["test-gen-noise", noise, "10", "44100"]) == 0
    Params.test_truncate = 4
    try:
        loader = WavChunkLoader(noise)
        loader.load_next_chunk()
        assert loader.wav_data().n_frames == 4 * 44100
    finally:
        Params.test_truncate = 0
