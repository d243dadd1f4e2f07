"""Rate-1/6 (A/B) / rate-1/12 (AB), order-15 convolutional code.

Reference behavior: src/convcode.cc — 12 octal generators split across A/B
block types, shift-register encoder with `order` zero-termination bits, and a
full soft-decision Viterbi decoder over 2^15 = 32768 states with squared-error
branch metrics.

TPU design: the Viterbi add-compare-select is one `lax.scan` over time steps
where each step is a dense vector op over all 32768 states:

    new_metric[s] = min(old[s>>1], old[(s>>1) + 2^14]) + bm[s]

All branch metrics are computed up front with ONE matmul
(steps x rate) @ (rate x 32768) that maps onto the MXU, and the per-step
min/select is pure VPU work.  Traceback is a second (cheap) scan.  Decoding is
batchable over candidate patterns via vmap.

Tie-breaking matches the reference exactly: the lower-numbered predecessor
wins on equal path metrics (strict-less update, ascending state order).
"""

from __future__ import annotations

from enum import Enum
from functools import lru_cache, partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


class ConvBlockType(Enum):
    a = 0
    b = 1
    ab = 2


AB_GENERATORS = (
    0o66561, 0o75211, 0o71545, 0o54435, 0o63635, 0o52475,
    0o63543, 0o75307, 0o52547, 0o45627, 0o67657, 0o51757,
)
AB_RATE = len(AB_GENERATORS)
ORDER = 15
STATE_COUNT = 1 << ORDER
STATE_MASK = STATE_COUNT - 1
_BIG = np.float32(1e9)


def get_block_type_generators(block_type: ConvBlockType) -> Tuple[int, ...]:
    if block_type == ConvBlockType.a:
        return AB_GENERATORS[0::2]
    if block_type == ConvBlockType.b:
        return AB_GENERATORS[1::2]
    return AB_GENERATORS


def conv_code_size(block_type: ConvBlockType, msg_size: int) -> int:
    if block_type in (ConvBlockType.a, ConvBlockType.b):
        return (msg_size + ORDER) * AB_RATE // 2
    return (msg_size + ORDER) * AB_RATE


def conv_encode(block_type: ConvBlockType, in_bits) -> np.ndarray:
    """Shift-register encoder (vectorized): out[t,p] = XOR_k poly_k bits[t-k]."""
    generators = get_block_type_generators(block_type)
    bits = np.concatenate([np.asarray(in_bits, dtype=np.uint8),
                           np.zeros(ORDER, dtype=np.uint8)])
    n = len(bits)
    out = np.zeros((n, len(generators)), dtype=np.uint8)
    padded = np.concatenate([np.zeros(ORDER - 1, dtype=np.uint8), bits])
    for p, poly in enumerate(generators):
        acc = np.zeros(n, dtype=np.uint8)
        for k in range(ORDER):
            if poly & (1 << k):
                # reg bit k at step t is input bit t-k
                acc ^= padded[ORDER - 1 - k: ORDER - 1 - k + n]
        out[:, p] = acc
    return out.reshape(-1).astype(np.int32)


@lru_cache(maxsize=None)
def _state_output_table(block_type: ConvBlockType) -> np.ndarray:
    """S[state, p] = parity(state & poly) as float32 (STATE_COUNT, rate)."""
    generators = get_block_type_generators(block_type)
    states = np.arange(STATE_COUNT, dtype=np.uint32)
    cols = []
    for poly in generators:
        v = states & np.uint32(poly)
        # parity via popcount folding
        v ^= v >> 8
        v ^= v >> 4
        v ^= v >> 2
        v ^= v >> 1
        cols.append((v & 1).astype(np.float32))
    return np.stack(cols, axis=1)


@partial(jax.jit, static_argnames=("rate",))
def _viterbi_core(coded: jnp.ndarray, s_table: jnp.ndarray, rate: int):
    """Viterbi ACS + traceback for one coded-bit vector.

    coded: (steps*rate,) float32.  Returns (decoded_bits (steps,), final_err).
    """
    steps = coded.shape[0] // rate
    c = coded.reshape(steps, rate)

    # branch metrics for all steps at once:
    #   bm[t, s] = sum_p (c[t,p] - S[s,p])^2
    #            = sum_p c^2 - 2 c @ S^T + sum_p S
    c_sq = jnp.sum(c * c, axis=1, keepdims=True)              # (steps, 1)
    s_sum = jnp.sum(s_table, axis=1)[None, :]                 # (1, states)
    bm = c_sq - 2.0 * jnp.dot(c, s_table.T,
                              preferred_element_type=jnp.float32) + s_sum

    if jax.default_backend() == "tpu":
        # in-VMEM trellis (bit-exact with the scan; see ops/viterbi_pallas)
        from ..ops.viterbi_pallas import viterbi_acs_pallas
        decisions, metric2d = viterbi_acs_pallas(bm)
        final_err = metric2d.reshape(-1)[0] / jnp.float32(coded.shape[0])
    else:
        init = jnp.full((STATE_COUNT,), _BIG, dtype=jnp.float32).at[0].set(0.0)

        def acs_step(metric, bm_t):
            lo = metric[: STATE_COUNT // 2]
            hi = metric[STATE_COUNT // 2:]
            # predecessor p_a = s>>1 (lo), p_b = s>>1 + 2^14 (hi);
            # strict-less: hi wins only if strictly better (matches reference)
            decision = hi < lo
            best = jnp.where(decision, hi, lo)
            new_metric = jnp.repeat(best, 2) + bm_t
            return new_metric, jnp.repeat(decision, 2)

        final_metric, decisions = jax.lax.scan(acs_step, init, bm)
        final_err = final_metric[0] / jnp.float32(coded.shape[0])

    def traceback_step(state, dec_t):
        bit = state & 1
        prev = (state >> 1) | (dec_t[state].astype(jnp.int32) << (ORDER - 1))
        return prev, bit

    _, bits_rev = jax.lax.scan(traceback_step, jnp.int32(0), decisions,
                               reverse=True)
    # scan(reverse=True) emits outputs in forward order already
    return bits_rev, final_err


def _batch_branch_metrics(codeds: jnp.ndarray,
                          s_tables: jnp.ndarray) -> jnp.ndarray:
    """bm[b, t, s] = sum_p (c[b,t,p] - S[b,s,p])^2 via one matmul."""
    B = codeds.shape[0]
    rate = s_tables.shape[2]
    c = codeds.reshape(B, -1, rate)
    c_sq = jnp.sum(c * c, axis=2, keepdims=True)              # (B, steps, 1)
    s_sum = jnp.sum(s_tables, axis=2)[:, None, :]             # (B, 1, states)
    return c_sq - 2.0 * jnp.einsum("bsr,bkr->bsk", c, s_tables,
                                   preferred_element_type=jnp.float32) + s_sum


def _trellis_from_bm(bm: jnp.ndarray, n_coded: jnp.ndarray):
    """Shared batched ACS + traceback from precomputed branch metrics.

    bm: (B, steps, STATE_COUNT); n_coded: (B,) divisor for the per-bit
    error normalization (steps*rate of each row's code)."""
    B = bm.shape[0]
    if jax.default_backend() == "tpu":
        from ..ops.viterbi_pallas import viterbi_acs_pallas_batch
        decisions, metrics = viterbi_acs_pallas_batch(bm)
        final_err = metrics.reshape(B, -1)[:, 0] / n_coded
        dec_t_major = jnp.swapaxes(decisions, 0, 1)   # (steps, B, states)
    else:
        init = jnp.full((B, STATE_COUNT), _BIG,
                        dtype=jnp.float32).at[:, 0].set(0.0)

        def acs_step(metric, bm_t):
            lo = metric[:, : STATE_COUNT // 2]
            hi = metric[:, STATE_COUNT // 2:]
            decision = hi < lo
            best = jnp.where(decision, hi, lo)
            return (jnp.repeat(best, 2, axis=1) + bm_t,
                    jnp.repeat(decision, 2, axis=1))

        final_metric, dec_t_major = jax.lax.scan(
            acs_step, init, jnp.swapaxes(bm, 0, 1))
        final_err = final_metric[:, 0] / n_coded

    def traceback_step(state, dec_t):                 # state (B,)
        bit = state & 1
        d = jnp.take_along_axis(dec_t.astype(jnp.int32),
                                state[:, None], axis=1)[:, 0]
        prev = (state >> 1) | (d << (ORDER - 1))
        return prev, bit

    _, bits_rev = jax.lax.scan(traceback_step, jnp.zeros(B, jnp.int32),
                               dec_t_major, reverse=True)
    return jnp.swapaxes(bits_rev, 0, 1), final_err


@partial(jax.jit, static_argnames=("rate",))
def _viterbi_core_batch(codeds: jnp.ndarray, s_tables: jnp.ndarray,
                        rate: int):
    """Batched Viterbi: B sequences advance through ONE trellis.

    codeds: (B, steps*rate) f32; s_tables: (B, states, rate) — per-sequence
    generator tables, so A- and B-block decodes share one launch.  On TPU
    the whole batch runs as a single Pallas grid of `steps` (the B
    candidates x 2 block types would otherwise serialize 2B kernels of
    `steps` sequential grid iterations each).  Bit-exact with per-sequence
    _viterbi_core (tests/test_codec.py)."""
    bm = _batch_branch_metrics(codeds, s_tables)
    n_coded = jnp.full((codeds.shape[0],), codeds.shape[1], jnp.float32)
    return _trellis_from_bm(bm, n_coded)


@jax.jit
def _viterbi_mixed_core(codeds: tuple, s_tables: tuple):
    """Mixed-rate batched Viterbi: groups with DIFFERENT generator sets and
    rates (a/b at rate 6, ab at rate 12) share ONE trellis launch — branch
    metrics are computed per group, then every sequence advances through
    the same `steps`-long grid (the step count (msg+order) is rate-
    independent, src/convcode.cc:65-75)."""
    bms = []
    n_coded = []
    for c, st in zip(codeds, s_tables):
        bms.append(_batch_branch_metrics(
            c, jnp.broadcast_to(st[None], (c.shape[0],) + st.shape)))
        n_coded.append(jnp.full((c.shape[0],), c.shape[1], jnp.float32))
    return _trellis_from_bm(jnp.concatenate(bms, axis=0),
                            jnp.concatenate(n_coded))


# rows per batched trellis launch: the pallas kernel costs ~768 KB of
# scoped VMEM per row (320 KB scratch + double-buffered bm/decision blocks
# + the metric accumulator, ops/viterbi_pallas.py) against the 16 MB
# limit — observed OOMs: B=60 -> 18.75M (scratch alone), B=24 -> 18.0M
# (full stack).  16 rows = 12 MB, with headroom.
_MIXED_CAP = 16


def conv_decode_soft_mixed(groups):
    """Mixed-type batched Viterbi decode with a bounded launch plan.

    groups: list of (block_type, coded (B_i, n_i)) with equal step counts
    (a/b at rate 6 and ab at rate 12 share the step axis, so their branch
    metrics concat into one trellis grid).  Rows from ALL groups pack into
    <=_MIXED_CAP-row launches in 4-row units — each unit is one subgroup,
    so the compiled-shape set stays small whatever the a/b/ab mix — and
    EVERY launch is enqueued before any result is fetched: through the
    remote-TPU tunnel the per-launch dispatch+fetch round trips overlap
    instead of serializing.  Returns [(bits (B_i, n_msg_i), errs (B_i,))]
    per group, semantics identical to conv_decode_soft_batch per group."""
    if not groups:
        return []
    steps = {c.shape[1] // len(get_block_type_generators(bt))
             for bt, c in groups}
    assert len(steps) == 1, "mixed decode requires equal step counts"

    table_cache = {}
    counts = []
    units = []                     # (group index, coded rows (4, n), table)
    for gi, (bt, c) in enumerate(groups):
        c = np.asarray(c, dtype=np.float32)
        counts.append(c.shape[0])
        pad = -c.shape[0] % 4
        if pad:
            c = np.concatenate(
                [c, np.zeros((pad, c.shape[1]), np.float32)])
        if bt not in table_cache:
            table_cache[bt] = jnp.asarray(_state_output_table(bt))
        cj = jnp.asarray(c)
        for k in range(0, c.shape[0], 4):
            units.append((gi, cj[k:k + 4], table_cache[bt]))

    launches = []                  # (units of the launch, device outputs)
    i = 0
    while i < len(units):
        take = units[i: i + _MIXED_CAP // 4]
        i += len(take)
        dev = _viterbi_mixed_core(tuple(u[1] for u in take),
                                  tuple(u[2] for u in take))
        launches.append((take, dev))

    per_bits = [[] for _ in groups]
    per_errs = [[] for _ in groups]
    for take, (bits_d, errs_d) in launches:
        bits = np.asarray(bits_d, dtype=np.int32)
        errs = np.asarray(errs_d)
        k = 0
        for gi, rows, _ in take:
            n = rows.shape[0]
            per_bits[gi].append(bits[k:k + n])
            per_errs[gi].append(errs[k:k + n])
            k += n
    out = []
    for gi, (bt, c) in enumerate(groups):
        if not per_bits[gi]:       # empty group: typed empty outputs
            rate = len(get_block_type_generators(bt))
            n_msg = c.shape[1] // rate - ORDER
            out.append((np.zeros((0, max(n_msg, 0)), np.int32),
                        np.zeros(0, np.float32)))
            continue
        b = np.concatenate(per_bits[gi], axis=0)[: counts[gi]]
        e = np.concatenate(per_errs[gi])[: counts[gi]]
        out.append((b[:, : b.shape[1] - ORDER], e))
    return out


def conv_decode_soft(block_type: ConvBlockType, coded_bits,
                     return_error: bool = False):
    """Soft-decision Viterbi decode; coded_bits in [0,1] floats."""
    generators = get_block_type_generators(block_type)
    rate = len(generators)
    coded = np.asarray(coded_bits, dtype=np.float32)
    assert coded.size % rate == 0
    s_table = jnp.asarray(_state_output_table(block_type))
    bits, err = _viterbi_core(jnp.asarray(coded), s_table, rate)
    bits = np.asarray(bits, dtype=np.int32)
    decoded = bits[: bits.size - ORDER]
    if return_error:
        return decoded, float(err)
    return decoded


def conv_decode_soft_batch(block_type: ConvBlockType,
                           coded_batch: np.ndarray):
    """Batched decode: (B, n_coded) -> ((B, n_msg) bits, (B,) errors).

    Chunks of 8 share one trellis launch; the (chunk, steps, 2^15) branch-
    metric tensor stays ~150 MB."""
    generators = get_block_type_generators(block_type)
    rate = len(generators)
    coded = np.asarray(coded_batch, dtype=np.float32)
    B = coded.shape[0]
    if B == 0:
        n_msg = (coded.shape[1] // rate - ORDER) if coded.ndim == 2 else 0
        return (np.zeros((0, max(n_msg, 0)), dtype=np.int32),
                np.zeros(0, dtype=np.float32))
    s_table = jnp.asarray(_state_output_table(block_type))
    CHUNK = 8
    # pad the batch to a CHUNK multiple: a data-dependent remainder shape
    # would recompile the trellis per candidate count
    padded = -(-B // CHUNK) * CHUNK
    if padded != B:
        coded = np.concatenate(
            [coded, np.zeros((padded - B, coded.shape[1]), np.float32)])
    coded_j = jnp.asarray(coded)
    tables = jnp.broadcast_to(s_table[None], (CHUNK,) + s_table.shape)
    bits_out, errs_out = [], []
    for k0 in range(0, padded, CHUNK):
        bits, errs = _viterbi_core_batch(coded_j[k0:k0 + CHUNK], tables,
                                         rate)
        bits_out.append(np.asarray(bits, dtype=np.int32))
        errs_out.append(np.asarray(errs))
    bits = np.concatenate(bits_out, axis=0)[:B]
    return bits[:, : bits.shape[1] - ORDER], np.concatenate(errs_out)[:B]


def conv_decode_hard(block_type: ConvBlockType, coded_bits) -> np.ndarray:
    soft = np.asarray(coded_bits, dtype=np.float32)
    return conv_decode_soft(block_type, soft)
