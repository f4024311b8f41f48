"""Pallas TPU kernel: fused sliding NtHash1-32 + density select + compaction.

One HBM pass replaces the XLA stages B-F of the batch pipeline
(seed lookup -> rotate -> sliding-window XOR -> canonical min -> threshold ->
stream compaction).  TPU-native rebuild of the reference's hot loop
(src/nthash_avx512_32.rs:84-164: 16-lane sliding hash + `cmp_epu32` +
`compressstoreu`), scaled from 16 AVX-512 lanes to [rows, 128]-lane tiles
with the same XOR-scan algebra.

Input is the "packed" stream: packed[b, j] = (orig_pos << 3) | code, where
j indexes HPC space for the hpc/hpcsimd modes and plain sequence space
otherwise (pos == j then).  Window w covers packed[w : w+l]; its canonical
hash is

    fh(w) = rol32(XOR_{i<l} rol32(seed_f(c[w+i]), (w+i) % 32), (l-1+w) % 32)
    rh(w) = rol32(XOR_{i<l} rol32(seed_r(c[w+i]), -(w+i) % 32), (-w) % 32)
    h(w)  = min(fh, rh)   (src/nthash_hpc.rs:231)

Because every block's flat position is taken modulo 32 and the lane count
(128) is a multiple of 32, all rotate amounts depend only on the lane
index — they are compile-time per-lane constants.  The sliding-window XOR
uses the log-doubling scheme with "flat shifts" (shift by s < 128 of the
row-major [R, 128] layout = two cyclic lane-rolls + lane select).

Survivor records (start, end, hash) are compacted in-kernel with the same
rank/roll machinery as compact_kernel.py.

All u32 semantics are emulated on int32: logical right shifts via
lax.shift_right_logical, unsigned compares via sign-bit bias.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import SEED_TABLE_F, SEED_TABLE_R
from .compact_kernel import (
    GROUP,
    LANES,
    SUBLANES,
    _compact_group,
)

I32 = jnp.int32
SIGN = np.int32(-0x80000000)  # 0x80000000 as int32


def _shrl(x, s):
    """Logical (unsigned) right shift on int32."""
    return jax.lax.shift_right_logical(x, s)


def _rol32_const(x, r: int):
    """Rotate-left by a static amount on int32 bit patterns."""
    r &= 31
    if r == 0:
        return x
    return (x << r) | _shrl(x, 32 - r)


def _rol32_lane(x, amounts):
    """Rotate-left with per-lane (broadcast) int32 amounts in [0, 32)."""
    return (x << amounts) | _shrl(_shrl(x, 31 - amounts), 1)


def _ult(a, b):
    """Unsigned a < b on int32 bit patterns."""
    return (a ^ SIGN) < (b ^ SIGN)


def _umin(a, b):
    return jnp.where(_ult(a, b), a, b)


def _seed_tree(table: np.ndarray, code):
    """Select seed constants by the 3 bits of `code` (0..6)."""
    t = [jnp.int32(np.uint32(v).view(np.int32)) for v in table]
    t = t + [jnp.int32(0)] * (8 - len(t))
    b0 = (code & 1) != 0
    b1 = (code & 2) != 0
    b2 = (code & 4) != 0
    lo = jnp.where(b1, jnp.where(b0, t[3], t[2]), jnp.where(b0, t[1], t[0]))
    hi = jnp.where(b1, jnp.where(b0, t[7], t[6]), jnp.where(b0, t[5], t[4]))
    return jnp.where(b2, hi, lo)


def _row_shift_up(x, q: int):
    """Shift rows up by a static q (vacated rows zero-filled)."""
    if q == 0:
        return x
    R = x.shape[0]
    pad = jnp.zeros((q, LANES), dtype=x.dtype)
    return jnp.concatenate([x[q:], pad], axis=0)


def _flat_shift(x, s: int):
    """y_flat[i] = x_flat[i + s] over the row-major [R, 128] layout, for
    static 0 <= s < 128.  Entries within s of the flat end become garbage
    (fed by zero rows); callers track validity."""
    if s == 0:
        return x
    li = jax.lax.broadcasted_iota(I32, x.shape, dimension=1)
    a = pltpu.roll(x, LANES - s, 1)  # lane-roll left by s
    b = pltpu.roll(_row_shift_up(x, 1), LANES - s, 1)
    return jnp.where(li < LANES - s, a, b)


def _sliding_window_xor_flat(x, l: int):
    """W[i] = XOR_{j<l} x[i+j] on the flat [R, 128] layout (log-doubling)."""
    if l == 1:
        return x
    acc = None
    acc_len = 0
    w = x
    m = 1
    rem = l
    while rem:
        if rem & 1:
            term = _flat_shift(w, acc_len)
            acc = term if acc is None else acc ^ term
            acc_len += m
        rem >>= 1
        if rem:
            w = w ^ _flat_shift(w, m)
            m <<= 1
    return acc


def _minimizer_kernel(
    eff_ref,  # scalar prefetch: int32[B] window-start limit per batch row
    packed_ref,  # (1, br, 128) main block
    halo_ref,  # (1, 8, 128) next rows after the block
    start_out,
    end_out,
    hash_out,
    count_ref,
    cnt_smem,
    *,
    l: int,
    bound: int,
    strict: bool,
    end_shift: int,
    end_sub: int,
    br: int,
    mr: int,
    nt: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cnt_smem[0] = 0

    main = packed_ref[0]  # [br, 128]
    halo = halo_ref[0][0:1]  # [1, 128] first halo row
    ext = jnp.concatenate([main, halo], axis=0)  # [br+1, 128]

    pos = _shrl(ext, 3)
    code = ext & 7

    li = jax.lax.broadcasted_iota(I32, ext.shape, dimension=1)
    lane_mod = li & 31
    # Flat index n == lane (mod 32) because rows are 128 == 0 (mod 32).
    rot_f = (32 - lane_mod) & 31  # rol by (-n) mod 32
    rot_r = lane_mod  # rol by n mod 32

    a_f = _rol32_lane(_seed_tree(SEED_TABLE_F, code), rot_f)
    a_r = _rol32_lane(_seed_tree(SEED_TABLE_R, code), rot_r)

    wf = _sliding_window_xor_flat(a_f, l)
    wr = _sliding_window_xor_flat(a_r, l)

    # fh = rol32(wf, (l-1+n) mod 32); rh = rol32(wr, (-n) mod 32)
    fh = _rol32_lane(wf, (jnp.int32(l - 1) + lane_mod) & 31)
    rh = _rol32_lane(wr, rot_f)
    h = _umin(fh, rh)

    # end position column (flat shift of pos by end_shift, minus end_sub)
    end_col = _flat_shift(pos, end_shift) - end_sub

    # validity: global window start n <= limit (limit pre-adjusted per mode)
    limit = eff_ref[b]
    ri = jax.lax.broadcasted_iota(I32, ext.shape, dimension=0)
    n_glob = t * (br * LANES) + ri * LANES + li
    bnd = jnp.int32(np.uint32(bound).view(np.int32))
    passed = _ult(h, bnd) if strict else ~_ult(bnd, h)
    mask = passed & (n_glob <= limit)

    # drop the lookahead row and compact
    maskb = mask[:br]
    cols = [pos[:br], end_col[:br], h[:br]]
    out_refs = (start_out, end_out, hash_out)
    total = cnt_smem[0]
    for g in range(br // SUBLANES):
        r0 = g * SUBLANES
        total = _compact_group(
            maskb[r0 : r0 + SUBLANES].astype(I32),
            [c[r0 : r0 + SUBLANES] for c in cols],
            total,
            out_refs,
            mr,
        )
    cnt_smem[0] = total
    count_ref[0] = jnp.full((SUBLANES, LANES), total, dtype=I32)


@functools.partial(
    jax.jit,
    static_argnames=("l", "bound", "strict", "hpc_end", "m", "block_rows", "interpret"),
)
def minimizer_scan(
    packed: jnp.ndarray,  # int32[B, N]: (pos << 3) | code
    limit: jnp.ndarray,  # int32[B]: max valid window start (inclusive)
    l: int,
    bound: int,
    strict: bool,
    hpc_end: bool,
    m: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (start int32[B, M'], end int32[B, M'], hash int32[B, M'] (u32 bit
    patterns), raw count int32[B]) with M' = ceil(m/128)*128.  Entries
    beyond count are garbage (caller masks).

    `limit[b]` must already encode the mode's window rule:
      regular/simd/hpcsimd: eff_len - l      (<= comparator on start index)
      hpc:                  eff_len - l - 1  (last window dropped)
    and -1 (or any negative) when the read is gated off entirely.
    `hpc_end=False`: end = pos[w + l - 1]; True: end = pos[w + l] - 1.
    """
    if not (1 <= l <= 127):
        raise ValueError(f"l={l} must be in [1, 127] for the fused kernel")
    B, N = packed.shape
    npad = -(-N // GROUP) * GROUP - N
    if npad:
        packed = jnp.pad(packed, ((0, 0), (0, npad)))
        N += npad
    rows = N // LANES
    br = min(block_rows, rows)
    while rows % br:
        br //= 2
    nt = rows // br
    mr = -(-m // LANES) + SUBLANES + 2
    end_shift = l if hpc_end else l - 1
    end_sub = 1 if hpc_end else 0

    packed3 = packed.reshape(B, rows, LANES)
    n_chunks = rows // SUBLANES

    # NOTE: with PrefetchScalarGridSpec the scalar-prefetch refs are passed
    # to every index_map after the grid indices; accept-and-ignore them.
    main_spec = pl.BlockSpec(
        (1, br, LANES), lambda b, t, *_: (b, t, 0), memory_space=pltpu.VMEM
    )
    chunks_per_block = br // SUBLANES

    def halo_index(b, t, *_):
        return (b, jnp.minimum((t + 1) * chunks_per_block, n_chunks - 1), 0)

    halo_spec = pl.BlockSpec(
        (1, SUBLANES, LANES), halo_index, memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, mr, LANES), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec(
        (1, SUBLANES, LANES), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _minimizer_kernel,
        l=l,
        bound=bound,
        strict=strict,
        end_shift=end_shift,
        end_sub=end_sub,
        br=br,
        mr=mr,
        nt=nt,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[main_spec, halo_spec],
        out_specs=[out_spec, out_spec, out_spec, count_spec],
        scratch_shapes=[pltpu.SMEM((1,), I32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, mr, LANES), I32),
            jax.ShapeDtypeStruct((B, mr, LANES), I32),
            jax.ShapeDtypeStruct((B, mr, LANES), I32),
            jax.ShapeDtypeStruct((B, SUBLANES, LANES), I32),
        ],
        interpret=interpret,
    )(limit.astype(I32), packed3, packed3)

    mcap = -(-m // LANES) * LANES
    start = outs[0].reshape(B, mr * LANES)[:, :mcap]
    end = outs[1].reshape(B, mr * LANES)[:, :mcap]
    hsh = outs[2].reshape(B, mr * LANES)[:, :mcap]
    counts = outs[3][:, 0, 0]
    return start, end, hsh, counts
