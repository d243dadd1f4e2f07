"""Native C++ AES core parity tests (vs the numpy implementation)."""

import subprocess

import numpy as np
import pytest

from audiowmark_tpu.crypto import aes, native
from audiowmark_tpu.crypto.keys import Key


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", "/root/repo/native"], capture_output=True)
    native._tried = False
    native._lib = None
    if native.get_lib() is None:
        pytest.skip("native library not available")


def test_ecb_parity():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    rk = aes.expand_key(key)
    rng = np.random.RandomState(0)
    blocks = rng.randint(0, 256, size=(64, 16)).astype(np.uint8)
    a = native.ecb_encrypt(key, blocks)
    b = aes.encrypt_blocks(rk, blocks)
    assert np.array_equal(a, b)


def test_ctr_keystream_parity():
    key = bytes(16)
    rk = aes.expand_key(key)
    rng = np.random.RandomState(1)
    ivs = rng.randint(0, 256, size=(8, 16)).astype(np.uint8)
    a = native.ctr_keystreams_u64(key, ivs, 81)
    b = aes.ctr_keystreams_u64_batch(rk, ivs, 81)
    assert np.array_equal(a, b)


def test_ctr_wraparound():
    key = bytes(16)
    rk = aes.expand_key(key)
    ivs = np.full((1, 16), 0xFF, dtype=np.uint8)
    a = native.ctr_keystreams_u64(key, ivs, 8)
    b = aes.ctr_keystreams_u64_batch(rk, ivs, 8)
    assert np.array_equal(a, b)


def test_shuffle_parity_full_table():
    """All 1716 per-frame shuffles must match the numpy path bit-for-bit."""
    k = Key()
    k.set_test_key(77)
    seeds = list(range(1716))
    nat = native.shuffle_tables(k.aes_key(), seeds, 1, 81)

    # force the numpy fallback
    native._lib, saved = None, native._lib
    try:
        from audiowmark_tpu.crypto.prng import batched_shuffle_identity, Stream
        ref = batched_shuffle_identity(k, seeds, Stream.data_up_down, 81)
    finally:
        native._lib = saved
    assert np.array_equal(nat, ref)
