"""Cross-verification of the keyed PRNG against the real libgcrypt.

The reference derives all watermark layout from libgcrypt AES-128
(ECB seed derivation + CTR keystream).  When libgcrypt is present on the
system we drive it via ctypes and require our implementation to match its
output bit for bit — the strongest possible interop oracle without building
the reference binary.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from audiowmark_tpu.crypto import aes
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.crypto.prng import Random, Stream

GCRY_CIPHER_AES128 = 7
GCRY_CIPHER_MODE_ECB = 1
GCRY_CIPHER_MODE_CTR = 6
GCRYCTL_DISABLE_SECMEM = 37
GCRYCTL_INITIALIZATION_FINISHED = 38


@pytest.fixture(scope="module")
def gcrypt():
    for name in ("libgcrypt.so.20", ctypes.util.find_library("gcrypt")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        pytest.skip("libgcrypt not available")
    lib.gcry_check_version.restype = ctypes.c_char_p
    lib.gcry_check_version(None)
    lib.gcry_control(GCRYCTL_DISABLE_SECMEM, 0)
    lib.gcry_control(GCRYCTL_INITIALIZATION_FINISHED, 0)
    return lib


class GcryRandom:
    """Reference Random protocol driven through real libgcrypt."""

    def __init__(self, lib, key: bytes, seed: int, stream: int):
        self.lib = lib
        self.ctr = ctypes.c_void_p()
        self.ecb = ctypes.c_void_p()
        assert lib.gcry_cipher_open(ctypes.byref(self.ctr), GCRY_CIPHER_AES128,
                                    GCRY_CIPHER_MODE_CTR, 0) == 0
        assert lib.gcry_cipher_setkey(self.ctr, key, 16) == 0
        assert lib.gcry_cipher_open(ctypes.byref(self.ecb), GCRY_CIPHER_AES128,
                                    GCRY_CIPHER_MODE_ECB, 0) == 0
        assert lib.gcry_cipher_setkey(self.ecb, key, 16) == 0
        self.seed(seed, stream)

    def seed(self, seed: int, stream: int):
        plain = bytearray(16)
        plain[0:8] = seed.to_bytes(8, "big")
        plain[8] = stream
        cipher = bytes(16)
        assert self.lib.gcry_cipher_encrypt(
            self.ecb, cipher, 16, bytes(plain), 16) == 0
        assert self.lib.gcry_cipher_setctr(self.ctr, cipher, 16) == 0

    def draw_block_u64(self, n_bytes=256) -> np.ndarray:
        out = bytes(n_bytes)
        zeros = bytes(n_bytes)
        assert self.lib.gcry_cipher_encrypt(
            self.ctr, out, n_bytes, zeros, n_bytes) == 0
        return np.frombuffer(out, dtype=">u8").astype(np.uint64)


def test_keystream_matches_libgcrypt(gcrypt):
    key = Key()
    key.set_test_key(0xDEADBEEF)
    for stream in (Stream.data_up_down, Stream.sync_up_down, Stream.mix):
        for seed in (0, 1, 12345):
            ref = GcryRandom(gcrypt, key.aes_key(), seed, int(stream))
            want = np.concatenate([ref.draw_block_u64() for _ in range(3)])
            ours = Random(key, seed, stream)
            got = np.array([ours() for _ in range(want.size)], dtype=np.uint64)
            assert np.array_equal(got, want), (stream, seed)


def test_zero_key_keystream_matches_libgcrypt(gcrypt):
    key = Key()
    ref = GcryRandom(gcrypt, key.aes_key(), 0, int(Stream.frame_position))
    want = ref.draw_block_u64()
    ours = Random(key, 0, Stream.frame_position)
    got = np.array([ours() for _ in range(want.size)], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_reseed_matches_libgcrypt(gcrypt):
    """Per-frame reseeding (UpDownGen protocol) against libgcrypt."""
    key = Key()
    key.set_test_key(7)
    ref = GcryRandom(gcrypt, key.aes_key(), 0, int(Stream.sync_up_down))
    ours = Random(key, 0, Stream.sync_up_down)
    for f in (0, 1, 2, 509):
        ref.seed(f, int(Stream.sync_up_down))
        ours.seed(f, Stream.sync_up_down)
        want = ref.draw_block_u64()
        got = np.array([ours() for _ in range(want.size)], dtype=np.uint64)
        assert np.array_equal(got, want), f
