"""Pallas Viterbi ACS kernel vs the lax.scan reference (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiowmark_tpu.ops.viterbi_pallas import viterbi_acs_pallas, STATE_COUNT


def _scan_reference(bm):
    init = jnp.full((STATE_COUNT,), 1e9).at[0].set(0.0)

    def acs(m, bmt):
        lo = m[: STATE_COUNT // 2]
        hi = m[STATE_COUNT // 2:]
        dec = hi < lo
        return jnp.repeat(jnp.where(dec, hi, lo), 2) + bmt, jnp.repeat(dec, 2)

    return jax.lax.scan(acs, init, bm)


def test_pallas_acs_matches_scan():
    rng = np.random.RandomState(0)
    bm = jnp.asarray(rng.rand(12, STATE_COUNT).astype(np.float32))
    fm, decs = _scan_reference(bm)
    d2, m2 = viterbi_acs_pallas(bm, interpret=True)
    assert np.allclose(np.asarray(fm), np.asarray(m2).reshape(-1))
    assert np.array_equal(np.asarray(decs).astype(np.int8), np.asarray(d2))


def test_pallas_acs_batch_matches_scan():
    from audiowmark_tpu.ops.viterbi_pallas import viterbi_acs_pallas_batch
    rng = np.random.RandomState(1)
    B, steps = 3, 9
    bm = jnp.asarray(rng.rand(B, steps, STATE_COUNT).astype(np.float32))
    d2, m2 = viterbi_acs_pallas_batch(bm, interpret=True)
    for b in range(B):
        fm, decs = _scan_reference(bm[b])
        assert np.allclose(np.asarray(fm),
                           np.asarray(m2[b]).reshape(-1)), b
        assert np.array_equal(np.asarray(decs).astype(np.int8),
                              np.asarray(d2[b])), b
