"""Microbenchmark: the fused speed scan's two gather stages, in isolation,
at real scan1 geometry — plus candidate reformulations.

The scan's cost model (docs/roadmap.md) says the random gathers dominate:

* compare: D3[idx, cols] with idx (states=8908, Jk=768) — a TWO-index-array
  gather (advanced indexing) repeated for 11 rels x 57 centers.
  Variant `flat` replaces it with a single flattened index vector into
  (rows*J, 2) — same elements, one index dim, contiguous 2-wide slices.
* resample: xpad[idx] with idx (8192, 96) gathering (C=2,) rows, 73 tiles
  per center.  Variant `dense` replaces the gather with contiguous
  dynamic-slice windows + a banded coefficient einsum (no gather at all;
  ~8x the VPU flops, which a v5e trades well against random HBM access).

Run standalone on the TPU (pays one tunnel cold-start):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/gather_bench.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402

STATES = 8908
JK = 768
ROWS = 4608
J2 = 1020            # 2 * J columns of the mag matrix
RELS = 11
T_TILE = 8192
N_TILES = 73
TAPS = 96
C = 2


def timed(fn, *args, n=3):
    fn(*args).block_until_ready()            # compile
    float(jnp.sum(fn(*args)))                # force a real sync (tunnel)
    t0 = time.monotonic()
    for _ in range(n):
        r = fn(*args)
    s = float(jnp.sum(r))                    # scalar fetch = real barrier
    return (time.monotonic() - t0) / n, s


# ---- compare-stage variants ------------------------------------------------

@jax.jit
def compare_2idx(D3, idx, cols):
    def per_rel(ix):
        g = D3[ix, cols[None, :]]            # (states, Jk, 2)
        return jnp.sum(g, axis=(0, 1))
    return jax.lax.map(per_rel, idx)


@jax.jit
def compare_flat(Dflat, idx, cols):
    J = J2 // 2

    def per_rel(ix):
        g = Dflat[ix * J + cols[None, :]]    # (states, Jk, 2)
        return jnp.sum(g, axis=(0, 1))
    return jax.lax.map(per_rel, idx)


BLK = 32
NSEL = 8
BAND = BLK + NSEL


@jax.jit
def compare_banded(Dtp, so_hi, fo, cols):
    """The banded form at the same geometry: contiguous (BAND, 2) slices
    per (32-state block, entry) + static-view select.  so_hi must be
    monotone ~unit-step (as the real offset tables are)."""
    NB = so_hi.shape[0] // BLK
    rows_pad = ROWS + 2 * BAND

    def per_rel(f_hi):
        sh0 = so_hi.reshape(NB, BLK)[:, 0]
        start = sh0[:, None] + f_hi[None, :] + BAND          # dmin = 0
        cst = jnp.clip(start, 0, rows_pad - BAND)

        def fetch(c, st):
            return jax.lax.dynamic_slice(
                Dtp, (c, st, jnp.int32(0)), (1, BAND, 2))[0]

        G = jax.vmap(jax.vmap(fetch, in_axes=(0, 0)),
                     in_axes=(None, 0))(cols, cst)
        idx = so_hi[:, None] + f_hi[None, :]
        o = jnp.arange(BLK, dtype=jnp.int32)
        d2 = (idx.reshape(NB, BLK, JK).transpose(0, 2, 1)
              + BAND - cst[:, :, None] - o[None, None, :])
        acc = jnp.zeros((NB, JK, BLK, 2), jnp.float32)
        for d in range(NSEL):
            Vd = jax.lax.slice_in_dim(G, d, d + BLK, axis=2)
            acc = acc + jnp.where((d2 == d)[..., None], Vd, 0.0)
        return jnp.sum(acc, axis=(0, 1, 2))

    return jax.lax.map(per_rel, fo)


# ---- resample-stage variants -----------------------------------------------

@jax.jit
def resample_gather(xpad, anchors, inv):
    taps = jnp.arange(TAPS, dtype=jnp.int32)

    def per_tile(ab):
        k = jnp.arange(T_TILE, dtype=jnp.int32)
        base = ab + k * inv
        idx = base[:, None] + taps[None, :]
        g = xpad[jnp.clip(idx, 0, xpad.shape[0] - 1)]     # (T, taps, C)
        frac = (k * 17).astype(jnp.float32) * 1e-4
        t = frac[:, None] - (taps.astype(jnp.float32) - 47.0)[None, :]
        coeff = jnp.sinc(t * 0.5) * jnp.where(jnp.abs(t) < 40.0, 1.0, 0.0)
        return jnp.einsum("jmc,jm->jc", g, coeff,
                          preferred_element_type=jnp.float32)

    y = jax.lax.map(per_tile, anchors)
    return jnp.sum(y)


KBLK = 256
WIN = 768            # KBLK * max_step(2.48) + TAPS, rounded to 128


@jax.jit
def resample_dense(xpad, anchors, inv):
    """No gather: contiguous window slices + banded coefficient einsum."""
    def per_tile(ab):
        def per_blk(b):
            k = jnp.arange(KBLK, dtype=jnp.int32)
            base = ab + (b * KBLK + k) * inv
            start = jnp.clip(base[0] - 48, 0, xpad.shape[0] - WIN)
            w = jax.lax.dynamic_slice(xpad, (start, 0), (WIN, C))
            pos = base.astype(jnp.float32) + (k * 17).astype(jnp.float32) \
                * 1e-4
            p = (start + jnp.arange(WIN, dtype=jnp.int32)
                 ).astype(jnp.float32)
            t = pos[:, None] + 47.0 - p[None, :]
            coeff = jnp.sinc(t * 0.5) * jnp.where(jnp.abs(t) < 40.0,
                                                  1.0, 0.0)
            return jnp.dot(coeff, w, preferred_element_type=jnp.float32)
        return jax.vmap(per_blk)(jnp.arange(T_TILE // KBLK,
                                            dtype=jnp.int32))

    y = jax.lax.map(per_tile, anchors)
    return jnp.sum(y)


def main():
    rng = np.random.default_rng(0)
    D3 = jnp.asarray(rng.standard_normal((ROWS, J2 // 2, 2), np.float32))
    Dflat = D3.reshape(ROWS * (J2 // 2), 2)
    idx = jnp.asarray(
        rng.integers(0, ROWS, size=(RELS, STATES, JK)).astype(np.int32))
    cols = jnp.asarray(
        rng.integers(0, J2 // 2, size=(JK,)).astype(np.int32))

    xpad = jnp.asarray(
        rng.standard_normal((N_TILES * T_TILE * 3, C)).astype(np.float32))
    anchors = jnp.asarray(
        (np.arange(N_TILES) * T_TILE * 2).astype(np.int32))
    inv = jnp.int32(2)

    out = {}
    print("timing compare variants (per 11-rel center) ...", file=sys.stderr)
    t, s1 = timed(compare_2idx, D3, idx, cols)
    out["compare_2idx_s"] = round(t, 4)
    t, s2 = timed(compare_flat, Dflat, idx, cols)
    out["compare_flat_s"] = round(t, 4)
    assert abs(s1 - s2) < abs(s1) * 1e-5 + 1e-3, (s1, s2)

    spad = -(-STATES // BLK) * BLK
    so_hi_b = jnp.asarray((np.arange(spad) - spad).astype(np.int32))
    fo_b = jnp.asarray(rng.integers(
        0, ROWS + spad, size=(RELS, JK)).astype(np.int32))
    Dtp = jnp.asarray(np.pad(
        np.transpose(np.asarray(D3), (1, 0, 2)),
        ((0, 0), (BAND, BAND), (0, 0))))
    t, _ = timed(compare_banded, Dtp, so_hi_b, fo_b, cols)
    out["compare_banded_s"] = round(t, 4)

    print("timing resample variants (per center) ...", file=sys.stderr)
    t, _ = timed(resample_gather, xpad, anchors, inv)
    out["resample_gather_s"] = round(t, 4)
    t, _ = timed(resample_dense, xpad, anchors, inv)
    out["resample_dense_s"] = round(t, 4)

    out["scan1_compare_x57_s"] = round(out["compare_2idx_s"] * 57, 2)
    out["scan1_resample_x57_s"] = round(out["resample_gather_s"] * 57, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
