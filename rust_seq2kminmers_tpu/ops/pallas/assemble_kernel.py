"""Pallas TPU kernel: fused k-min-mer assembly over the minimizer stream.

One launch replaces ~60 small XLA ops (mixhash + rotates + k-window XOR +
canonical min on emulated u64 pairs over [B, M] minimizer hashes — the
dispatch overhead dominated the XLA version at [32, 21k]).  Math identical
to ops/assemble.py (reference recurrences src/lib.rs:240-251, oracle
src/lib.rs:275-288): windows are computed over each row's minor axis; the
caller masks windows beyond its count - k + 1 as always.

u64 values are (hi, lo) int32 pairs; rotations by per-element amounts use
the swap + dual-shift decomposition of ops/u64.py on 32-bit lanes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_scan import I32, _shrl, _ult

SUBB = 8  # batch rows per block


def _shift_minor(x, s: int, M: int):
    """y[:, i] = x[:, i + s] along the minor axis (static s, zero fill)."""
    if s == 0:
        return x
    li = jax.lax.broadcasted_iota(I32, x.shape, dimension=1)
    rolled = pltpu.roll(x, M - s, 1)
    return jnp.where(li < M - s, rolled, 0)


def _window_xor_minor(x, k: int, M: int):
    """W[:, i] = XOR_{j<k} x[:, i+j] (log-doubling along the minor axis)."""
    if k == 1:
        return x
    acc = None
    acc_len = 0
    w = x
    m = 1
    rem = k
    while rem:
        if rem & 1:
            term = _shift_minor(w, acc_len, M)
            acc = term if acc is None else acc ^ term
            acc_len += m
        rem >>= 1
        if rem:
            w = w ^ _shift_minor(w, m, M)
            m <<= 1
    return acc


def _rol64_pair(hi, lo, r):
    """Rotate-left mod 64 of (hi, lo) int32 pairs by per-element r."""
    r = r & 63
    swap = r >= 32
    h = jnp.where(swap, lo, hi)
    l_ = jnp.where(swap, hi, lo)
    rr = r & 31
    carry_h = _shrl(_shrl(l_, 31 - rr), 1)
    carry_l = _shrl(_shrl(h, 31 - rr), 1)
    return (h << rr) | carry_h, (l_ << rr) | carry_l


def _assemble_kernel(mh_ref, hi_out, lo_out, rev_out, *, k: int, M: int):
    x = mh_ref[0]  # [SUBB, M] int32 = u32 minimizer hashes
    # xorshift mix to u64 (src/lib.rs:157-169): hi starts at 0
    hi = jnp.zeros_like(x)
    lo = x
    # x ^= x << 13
    hi = hi ^ ((hi << 13) | _shrl(lo, 19))
    lo = lo ^ (lo << 13)
    # x ^= x >> 7
    lo = lo ^ (_shrl(lo, 7) | (hi << 25))
    hi = hi ^ _shrl(hi, 7)
    # x ^= x << 17
    hi = hi ^ ((hi << 17) | _shrl(lo, 15))
    lo = lo ^ (lo << 17)

    j = jax.lax.broadcasted_iota(I32, x.shape, dimension=1)
    a_hi, a_lo = _rol64_pair(hi, lo, (64 - (j & 63)) & 63)
    b_hi, b_lo = _rol64_pair(hi, lo, j & 63)

    wa_hi = _window_xor_minor(a_hi, k, M)
    wa_lo = _window_xor_minor(a_lo, k, M)
    wb_hi = _window_xor_minor(b_hi, k, M)
    wb_lo = _window_xor_minor(b_lo, k, M)

    f_hi, f_lo = _rol64_pair(wa_hi, wa_lo, (jnp.int32(k - 1) + j) & 63)
    r_hi, r_lo = _rol64_pair(wb_hi, wb_lo, (64 - (j & 63)) & 63)

    r_lt_f = _ult(r_hi, f_hi) | ((r_hi == f_hi) & _ult(r_lo, f_lo))
    hi_out[0] = jnp.where(r_lt_f, r_hi, f_hi)
    lo_out[0] = jnp.where(r_lt_f, r_lo, f_lo)
    rev_out[0] = r_lt_f.astype(I32)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def assemble_kminmers_pallas(
    min_hash: jnp.ndarray,  # uint32[B, M]
    k: int,
    interpret: bool = False,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """-> ((hash_hi, hash_lo) uint32[B, M-k+1], rev bool[B, M-k+1]).

    Same contract as ops.assemble.assemble_kminmers; entries at windows
    beyond (count - k) are garbage and must be masked by the caller.
    """
    B, M = min_hash.shape
    if M < k:
        raise ValueError(f"minimizer capacity {M} < k={k}")
    Bp = -(-B // SUBB) * SUBB
    Mp = -(-M // 128) * 128
    if Mp > 32768:
        # A [SUBB, Mp] block would exceed scoped VMEM (~16 MB across the
        # ~14 live tiles); capacities this large only occur on rare
        # brute-force paths, so use the pure-XLA assembly there.
        from ..assemble import assemble_kminmers

        return assemble_kminmers(min_hash, k)
    x = min_hash
    if (Bp, Mp) != (B, M):
        x = jnp.pad(x, ((0, Bp - B), (0, Mp - M)))
    x = jax.lax.bitcast_convert_type(x, I32)

    spec = pl.BlockSpec(
        (SUBB, Mp), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_assemble_kernel, k=k, M=Mp)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // SUBB,),
        in_specs=[
            pl.BlockSpec(
                (1, SUBB, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (1, SUBB, Mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 3,
        out_shape=[
            jax.ShapeDtypeStruct((Bp // SUBB, SUBB, Mp), I32)
        ]
        * 3,
        interpret=interpret,
    )(x.reshape(Bp // SUBB, SUBB, Mp))
    nwin = M - k + 1
    hi = jax.lax.bitcast_convert_type(
        outs[0].reshape(Bp, Mp)[:B, :nwin], jnp.uint32
    )
    lo = jax.lax.bitcast_convert_type(
        outs[1].reshape(Bp, Mp)[:B, :nwin], jnp.uint32
    )
    rev = outs[2].reshape(Bp, Mp)[:B, :nwin] != 0
    return (hi, lo), rev
