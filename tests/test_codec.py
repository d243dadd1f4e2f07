"""FEC codec tests: conv code round trips with injected errors (modeled on the
reference testconvcode), shortcode round trip + error detection, interleaver
and table self-consistency."""

import numpy as np
import pytest

from audiowmark_tpu.codec.convcode import (
    ConvBlockType, conv_code_size, conv_encode, conv_decode_soft,
    conv_decode_soft_batch, conv_decode_hard,
)
from audiowmark_tpu.codec import shortcode
from audiowmark_tpu.params import Params


def test_code_size():
    assert conv_code_size(ConvBlockType.a, 128) == 858
    assert conv_code_size(ConvBlockType.b, 128) == 858
    assert conv_code_size(ConvBlockType.ab, 128) == 1716


def test_encode_length_and_determinism():
    rng = np.random.RandomState(1)
    bits = rng.randint(0, 2, 128)
    for bt in ConvBlockType:
        coded = conv_encode(bt, bits)
        assert coded.size == conv_code_size(bt, 128)
        assert np.array_equal(coded, conv_encode(bt, bits))


def test_encode_reference_impulse_property():
    # impulse response: first output bits equal the generator taps read out
    # over time (reg = ...0001 sliding out)
    bits = np.zeros(100, dtype=int)
    bits[0] = 1
    out = conv_encode(ConvBlockType.ab, bits).reshape(-1, 12)
    gens = [0o66561, 0o75211, 0o71545, 0o54435, 0o63635, 0o52475,
            0o63543, 0o75307, 0o52547, 0o45627, 0o67657, 0o51757]
    for t in range(15):
        for p, poly in enumerate(gens):
            assert out[t, p] == ((poly >> t) & 1)


@pytest.mark.parametrize("bt", list(ConvBlockType))
def test_roundtrip_no_errors(bt):
    rng = np.random.RandomState(7)
    bits = rng.randint(0, 2, 128)
    coded = conv_encode(bt, bits).astype(np.float32)
    decoded, err = conv_decode_soft(bt, coded, return_error=True)
    assert np.array_equal(decoded, bits)
    assert err == 0.0


@pytest.mark.parametrize("bt", list(ConvBlockType))
def test_roundtrip_with_bit_errors(bt):
    rng = np.random.RandomState(42)
    bits = rng.randint(0, 2, 128)
    coded = conv_encode(bt, bits).astype(np.float32)
    # flip ~12% of the coded bits — well inside the ~20% correction budget
    n_err = int(coded.size * 0.12)
    pos = rng.choice(coded.size, n_err, replace=False)
    coded[pos] = 1.0 - coded[pos]
    decoded, err = conv_decode_soft(bt, coded, return_error=True)
    assert np.array_equal(decoded, bits)
    assert err > 0


def test_soft_noise_roundtrip():
    rng = np.random.RandomState(3)
    bits = rng.randint(0, 2, 128)
    coded = conv_encode(ConvBlockType.a, bits).astype(np.float32)
    noisy = np.clip(coded + rng.normal(0, 0.35, coded.shape), -1, 2)
    decoded = conv_decode_soft(ConvBlockType.a, noisy)
    assert np.array_equal(decoded, bits)


def test_hard_decode():
    rng = np.random.RandomState(9)
    bits = rng.randint(0, 2, 64)
    coded = conv_encode(ConvBlockType.b, bits)
    assert np.array_equal(conv_decode_hard(ConvBlockType.b, coded), bits)


def test_batch_decode_matches_single():
    rng = np.random.RandomState(11)
    batch = []
    msgs = []
    for _ in range(3):
        bits = rng.randint(0, 2, 128)
        coded = conv_encode(ConvBlockType.a, bits).astype(np.float32)
        pos = rng.choice(coded.size, 40, replace=False)
        coded[pos] = 1 - coded[pos]
        batch.append(coded)
        msgs.append(bits)
    dec, errs = conv_decode_soft_batch(ConvBlockType.a, np.stack(batch))
    for i in range(3):
        assert np.array_equal(dec[i], msgs[i])


@pytest.mark.parametrize("k", [12, 16, 20])
def test_shortcode_roundtrip(k):
    assert shortcode.short_code_init(k) > 0
    rng = np.random.RandomState(k)
    bits = rng.randint(0, 2, k)
    coded = shortcode.short_encode(ConvBlockType.a, bits).astype(np.float32)
    n_err = int(coded.size * 0.10)
    pos = rng.choice(coded.size, n_err, replace=False)
    coded[pos] = 1 - coded[pos]
    decoded = shortcode.short_decode_soft(ConvBlockType.a, coded)
    assert np.array_equal(decoded, bits)


def test_shortcode_error_detection():
    shortcode.short_code_init(12)
    # a random non-codeword after Viterbi should usually fail the exact match
    bad = np.zeros(56, dtype=np.int32)
    bad[0] = 1  # weight-1 word is not a codeword of a d=22 code (except 0)
    assert shortcode.short_decode_blk(bad).size == 0
    # all-zeros IS a codeword -> decodes to all-zero message
    assert np.array_equal(shortcode.short_decode_blk(np.zeros(56, int)),
                          np.zeros(12, int))


def test_shortcode_min_distance_sample():
    # sampled check of the minimum distance property (d=22 for k=12)
    shortcode.short_code_init(12)
    mat = shortcode._MATRICES[12].astype(np.int32)
    rng = np.random.RandomState(5)
    for _ in range(200):
        m = rng.randint(0, 2, 12)
        if not m.any():
            continue
        cw = (m @ mat) & 1
        assert cw.sum() >= 22


def test_mixed_decode_matches_per_type_batches():
    """conv_decode_soft_mixed (a/b/ab in ONE trellis launch) must be
    bit-exact with the per-type batched decodes."""
    from audiowmark_tpu.codec.convcode import (conv_decode_soft_batch,
                                               conv_decode_soft_mixed,
                                               conv_encode)
    rng = np.random.RandomState(11)
    groups = []
    for bt, n in ((ConvBlockType.a, 3), (ConvBlockType.b, 2),
                  (ConvBlockType.ab, 1)):
        rows = []
        for _ in range(n):
            bits = rng.randint(0, 2, 128)
            coded = conv_encode(bt, bits).astype(np.float32)
            noisy = np.clip(coded + rng.randn(coded.size) * 0.3, 0, 1)
            rows.append(noisy)
        groups.append((bt, np.stack(rows).astype(np.float32)))
    mixed = conv_decode_soft_mixed(groups)
    for (bt, batch), (bits_m, errs_m) in zip(groups, mixed):
        bits_s, errs_s = conv_decode_soft_batch(bt, batch)
        assert np.array_equal(bits_m, bits_s)
        np.testing.assert_allclose(errs_m, errs_s, rtol=1e-6)


def test_mixed_decode_over_cap_matches_per_type_batches():
    """Totals above _MIXED_CAP rows must decode through the capped per-group
    launches (the uncapped pallas trellis OOMs scoped VMEM at B>=~50 on the
    30-minute-chunk path) and stay bit-exact with the per-type batches."""
    from audiowmark_tpu.codec import convcode
    from audiowmark_tpu.codec.convcode import (conv_decode_soft_batch,
                                               conv_decode_soft_mixed,
                                               conv_encode)
    rng = np.random.RandomState(13)
    groups = []
    # totals 25+8+7=40 > cap 32; group a exercises a full 32-chunk IF the
    # cap drops, and the 25-row group covers the padded-remainder branch
    for bt, n in ((ConvBlockType.a, 25), (ConvBlockType.b, 8),
                  (ConvBlockType.ab, 7)):
        rows = []
        for _ in range(n):
            bits = rng.randint(0, 2, 128)
            coded = conv_encode(bt, bits).astype(np.float32)
            noisy = np.clip(coded + rng.randn(coded.size) * 0.3, 0, 1)
            rows.append(noisy)
        groups.append((bt, np.stack(rows).astype(np.float32)))
    assert sum(b.shape[0] for _, b in groups) > convcode._MIXED_CAP
    mixed = conv_decode_soft_mixed(groups)
    for (bt, batch), (bits_m, errs_m) in zip(groups, mixed):
        bits_s, errs_s = conv_decode_soft_batch(bt, batch)
        assert np.array_equal(bits_m, bits_s)
        np.testing.assert_allclose(errs_m, errs_s, rtol=1e-6)
