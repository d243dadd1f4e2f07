"""AES / keyed PRNG tests: FIPS-197 + NIST SP 800-38A vectors, stream and
seed separation, shuffle semantics, batched-vs-scalar equivalence."""

import numpy as np

from audiowmark_tpu.crypto import aes
from audiowmark_tpu.crypto.keys import Key, tokenize
from audiowmark_tpu.crypto.prng import (
    Random, Stream, batched_shuffle_identity, batched_u64, seed_from_hash,
)


def test_aes_fips197():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rk = aes.expand_key(key)
    assert aes.encrypt_block(rk, pt) == ct


def test_aes_sp800_38a_ecb():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    rk = aes.expand_key(key)
    pts = [
        "6bc1bee22e409f96e93d7e117393172a",
        "ae2d8a571e03ac9c9eb76fac45af8e51",
        "30c81c46a35ce411e5fbc1191a0a52ef",
        "f69f2445df4f9b17ad2b417be66c3710",
    ]
    cts = [
        "3ad77bb40d7a3660a89ecaf32466ef97",
        "f5d3d58503b9699de785895a96fdbaaf",
        "43b1cd7f598ece23881b00e3ed030688",
        "7b0c785e27e8ad3f8223207104725dd4",
    ]
    blocks = np.stack([np.frombuffer(bytes.fromhex(p), dtype=np.uint8) for p in pts])
    out = aes.encrypt_blocks(rk, blocks)
    for i, ct in enumerate(cts):
        assert out[i].tobytes() == bytes.fromhex(ct)


def test_aes_ctr_counter_increment():
    # NIST SP 800-38A F.5.1 CTR-AES128: keystream block i = E(counter_i)
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    rk = aes.expand_key(key)
    counters = aes.ctr_counters(iv, 0, 4)
    ks = aes.encrypt_blocks(rk, counters)
    expected = [
        "ec8cdf7398607cb0f2d21675ea9ea1e4",
        "362b7c3c6773516318a077d7fc5073ae",
        "6a2cc3787889374fbeb4c81b17ba6c44",
        "e89c399ff0f198c6d40a31db156cabfe",
    ]
    for i, e in enumerate(expected):
        assert ks[i].tobytes() == bytes.fromhex(e)


def test_ctr_counter_wraps_16_bytes():
    iv = bytes.fromhex("ffffffffffffffffffffffffffffffff")
    counters = aes.ctr_counters(iv, 0, 2)
    assert counters[0].tobytes() == iv
    assert counters[1].tobytes() == bytes(16)


def test_random_stream_separation():
    key = Key()
    r1 = Random(key, 0, Stream.data_up_down)
    r2 = Random(key, 0, Stream.sync_up_down)
    a = [r1() for _ in range(8)]
    b = [r2() for _ in range(8)]
    assert a != b


def test_random_seed_determinism():
    key = Key()
    key.set_test_key(42)
    a = [Random(key, 7, Stream.mix)() for _ in range(3)]
    assert a[0] == a[1] == a[2]
    b = Random(key, 8, Stream.mix)()
    assert b != a[0]


def test_random_double_range():
    key = Key()
    r = Random(key, 0, Stream.speed_clip)
    for _ in range(100):
        d = r.random_double()
        assert 0.0 <= d < 1.0


def test_batched_matches_scalar():
    key = Key()
    key.set_test_key(123)
    got = batched_u64(key, [0, 1, 5], Stream.frame_position, 70)
    for row, seed in enumerate([0, 1, 5]):
        r = Random(key, seed, Stream.frame_position)
        expect = [r() for _ in range(70)]
        assert list(map(int, got[row])) == expect


def test_batched_shuffle_matches_scalar():
    key = Key()
    key.set_test_key(99)
    n = 81
    got = batched_shuffle_identity(key, [0, 3], Stream.sync_up_down, n)
    for row, seed in enumerate([0, 3]):
        r = Random(key, seed, Stream.sync_up_down)
        ref = list(range(n))
        r.shuffle(ref)
        assert list(map(int, got[row])) == ref


def test_shuffle_draws_n_values():
    # Fisher-Yates in the reference draws exactly n values (incl. final %1)
    key = Key()
    r1 = Random(key, 0, Stream.bit_order)
    v = list(range(10))
    r1.shuffle(v)
    r2 = Random(key, 0, Stream.bit_order)
    for _ in range(10):
        r2()
    assert r1() == r2()


def test_seed_from_hash():
    x = np.array([0.5, -0.25, 0.125], dtype=np.float32)
    s1 = seed_from_hash(x)
    s2 = seed_from_hash(x.copy())
    assert s1 == s2 and 0 < s1 < 2 ** 64


def test_key_file_tokenizer():
    assert tokenize('key 0123 # comment') == ["key", "0123"]
    assert tokenize('name "my \\"key\\""') == ["name", 'my "key"']
    assert tokenize("   ") == []
    assert tokenize('bad "unterminated') is None


def test_key_file_roundtrip(tmp_path):
    p = tmp_path / "k.key"
    p.write_text('# watermarking key for audiowmark\n\n'
                 'key 00112233445566778899aabbccddeeff\nname "prod"\n')
    k = Key()
    k.load_key(str(p))
    assert k.aes_key() == bytes.fromhex("00112233445566778899aabbccddeeff")
    assert k.name() == "prod"
