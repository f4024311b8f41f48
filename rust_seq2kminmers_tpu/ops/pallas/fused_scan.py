"""Fused single-pass Pallas TPU kernel: (optional) HPC compaction +
sliding canonical NtHash1-32 + density select + slot-local compaction.

This is the production hot path — the TPU-native rebuild of the reference's
entire L1+L2 layer (fused scalar HPC+NtHash iterator, src/nthash_hpc.rs, and
the AVX-512 16-lane kernels, src/hpc.rs:44-147 + src/nthash_avx512_32.rs),
designed for the hardware rather than translated:

  * One HBM read of the raw uint8 xcodes ((keep << 3) | code — the HPC
    raw-byte-diff keep flag is precomputed by the host encoder,
    constants.py) — no packed int32 input, no separate HPC materialization
    pass, no cross-block previous-char carry.
  * HPC compaction happens in VMEM per block as a stable "move by your
    rank deficit" permutation, decomposed over the offset's bits: 16 rounds
    of predicated flat shifts over the [R, 128] register tile (the flat
    generalization of AVX-512 `compressstoreu`).
  * Block-to-block state (the reference's ring buffer of the last l chars,
    src/nthash_hpc.rs:137-174) is a VMEM carry of exactly the last l
    compacted (position, code) elements + an SMEM scalar (global kept
    count).  A window is emitted by the block that holds its last
    element (its one-past-last element in hpc mode), so every window is
    emitted exactly once without lookahead halos.
  * NtHash rotate amounts depend on the *global kept rank* mod 32, carried
    as a scalar and added to the lane index (the same XOR-scan algebra as
    src/nthash_avx512_32.rs:367-425, over arbitrarily long reads).
  * Survivors (density d ~ 1%) are left-packed per 128-lane row and written
    to NSLOTS fixed slots per row: fixed-shape stores only; a cheap second
    pass (ops/compact.py) compacts the ~16x smaller slot arrays globally.
    Per-row slot overflow is detectable (row counts are returned raw).

All u32 semantics are emulated on int32 (logical shifts, sign-bias
compares), as TPU vector lanes are 32-bit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import SEED_TABLE_F, SEED_TABLE_R

I32 = jnp.int32
SIGN = np.int32(-0x80000000)
LANES = 128

def slots_for_density(density: float) -> int:
    """Survivor slots per 128-lane row: mean 128*d plus a generous tail
    margin (P[Binom(128, d) > slots] ~ 0); overflow is still detected via
    the returned row counts, never silent."""
    mean = 128.0 * max(density, 0.0)
    n = int(mean * 3 + 5 * (mean ** 0.5) + 6)
    return int(min(128, max(8, -(-n // 8) * 8)))  # multiple of 8 lanes


def _shrl(x, s):
    return jax.lax.shift_right_logical(x, s)


def _rol32_lane(x, amounts):
    """Rotate-left by per-element int32 amounts in [0, 32)."""
    return (x << amounts) | _shrl(_shrl(x, 31 - amounts), 1)


M31 = np.int32(0x7FFFFFFF)


def _rol31_lane(x, amounts):
    """31-bit rotate-left (NtHash2-31 variant, reference
    src/nthash2_avx512_32.rs:186-215): x in [0, 2^31), amounts in [0, 31)."""
    return ((x << amounts) | _shrl(x, 31 - amounts)) & M31


M16 = np.int32(0xFFFF)


def _rol16_lane(x, amounts):
    """16-bit rotate-left (H=u16 config, reference src/lib.rs:30): x in
    [0, 2^16), amounts in [0, 16)."""
    return ((x << amounts) | _shrl(x, 16 - amounts)) & M16


def _rol64_lane(hi, lo, r):
    """Rotate-left mod 64 of a u64 (hi, lo) int32-lane pair by per-element
    amounts r in [0, 64): conditional word swap on bit 5, then a 32-bit
    cross rotate by r & 31 (the kernel twin of ops/u64.py rol64)."""
    sw = (r & 32) != 0
    h = jnp.where(sw, lo, hi)
    lw = jnp.where(sw, hi, lo)
    s = r & 31
    hi2 = (h << s) | _shrl(_shrl(lw, 31 - s), 1)
    lo2 = (lw << s) | _shrl(_shrl(h, 31 - s), 1)
    return hi2, lo2


def _mod31(x):
    """Floor-mod 31 of int32 in (-2^22, 2^22) via exact f32 division, with
    a +/-1 correction guard against float rounding at the boundary."""
    q = jnp.floor(x.astype(F32) * (1.0 / 31.0)).astype(I32)
    m = x - q * 31
    m = jnp.where(m >= 31, m - 31, m)
    return jnp.where(m < 0, m + 31, m)


def _ult(a, b):
    return (a ^ SIGN) < (b ^ SIGN)


def _umin(a, b):
    return jnp.where(_ult(a, b), a, b)


def _ult64(a_hi, a_lo, b_hi, b_lo):
    return _ult(a_hi, b_hi) | ((a_hi == b_hi) & _ult(a_lo, b_lo))


def _seed_tree(table: np.ndarray, code):
    t = [jnp.int32(np.uint32(v).view(np.int32)) for v in table]
    t = t + [jnp.int32(0)] * (8 - len(t))
    b0 = (code & 1) != 0
    b1 = (code & 2) != 0
    b2 = (code & 4) != 0
    lo = jnp.where(b1, jnp.where(b0, t[3], t[2]), jnp.where(b0, t[1], t[0]))
    hi = jnp.where(b1, jnp.where(b0, t[7], t[6]), jnp.where(b0, t[5], t[4]))
    return jnp.where(b2, hi, lo)


def _row_shift_up(x, q: int):
    if q == 0:
        return x
    pad = jnp.zeros((q, LANES), dtype=x.dtype)
    return jnp.concatenate([x[q:], pad], axis=0)


def _flat_shift(x, s: int):
    """y_flat[i] = x_flat[i + s] over row-major [R, 128]; static 0<=s<128.

    roll commutes with the row shift, so one roll feeds both branches."""
    if s == 0:
        return x
    li = jax.lax.broadcasted_iota(I32, x.shape, dimension=1)
    a = pltpu.roll(x, LANES - s, 1)
    b = _row_shift_up(a, 1)
    return jnp.where(li < LANES - s, a, b)


def _flat_shift_any(x, s: int):
    """_flat_shift for any static s >= 0 (row part + lane part)."""
    q, r = divmod(s, LANES)
    return _flat_shift(_row_shift_up(x, q), r)


def _flat_shift_dyn(x, s):
    """y_flat[i] = x_flat[i + s] for a DYNAMIC scalar s in [0, R*128);
    positions wrapping past the end read garbage (callers mask).  Uses
    pltpu.roll's dynamic shift: one sublane roll + one lane roll + the
    row-boundary select."""
    R = x.shape[0]
    q = s // LANES
    r = s % LANES
    xq = pltpu.roll(x, (R - q) % R, 0)
    a = pltpu.roll(xq, (LANES - r) % LANES, 1)
    b = _row_shift_up(a, 1)
    li = jax.lax.broadcasted_iota(I32, x.shape, dimension=1)
    return jnp.where(li < LANES - r, a, b)


def _sliding_window_xor_flat(x, l: int):
    if l == 1:
        return x
    # pow2-peel: for l = 2^k - 2^j the doubling chain to w_{2^k} plus ONE
    # peel shift beats the binary ladder (e.g. l=31: 6 flat shifts vs 8):
    #   w_l[i] = w_{2^k}[i] ^ w_{2^j}[i + l]
    # (both terms read identical out-of-tile positions as zero, so the
    # garbage beyond the valid stream cancels exactly).
    lk = 1 << (l - 1).bit_length()  # next power of two >= l
    r = lk - l
    if r and (r & (r - 1)) == 0:
        pw = {1: x}
        w = x
        m = 1
        while m < lk:
            w = w ^ _flat_shift_any(w, m)
            m <<= 1
            pw[m] = w
        return pw[lk] ^ _flat_shift_any(pw[r], l)
    acc = None
    acc_len = 0
    w = x
    m = 1
    rem = l
    while rem:
        if rem & 1:
            term = _flat_shift_any(w, acc_len)
            acc = term if acc is None else acc ^ term
            acc_len += m
        rem >>= 1
        if rem:
            w = w ^ _flat_shift_any(w, m)
            m <<= 1
    return acc


F32 = jnp.float32


def _lane_cumsum_mxu(m):
    """In-row inclusive cumsum of small int32 over [R, 128] as ONE MXU
    matmul against an upper-triangular ones matrix (exact: sums < 2^24)."""
    i = jax.lax.broadcasted_iota(I32, (LANES, LANES), dimension=0)
    j = jax.lax.broadcasted_iota(I32, (LANES, LANES), dimension=1)
    tri = (i <= j).astype(F32)
    return jnp.dot(
        m.astype(F32), tri, preferred_element_type=F32
    )


def _flat_rank_inclusive(m, rows_mxu: bool = True):
    """Inclusive prefix sum of int32 over the flat [R, 128] layout.

    In-row cumsum and (for rows_mxu, R <= 512) the row-total prefix both run
    on the MXU as triangular-ones matmuls — replacing ~50 VPU ops with 3
    matmuls (exact while total counts < 2^24).  With rows_mxu=False the row
    prefix falls back to a log2(R) Hillis-Steele cascade (for large R where
    the [R, R] triangle would pressure VMEM)."""
    R = m.shape[0]
    mf = m.astype(F32)
    i = jax.lax.broadcasted_iota(I32, (LANES, LANES), dimension=0)
    j = jax.lax.broadcasted_iota(I32, (LANES, LANES), dimension=1)
    ps_f = jnp.dot(mf, (i <= j).astype(F32), preferred_element_type=F32)
    if rows_mxu and R <= 512:
        # row totals broadcast over lanes, then strict row prefix — both as
        # ones-matmuls; the [R, R] strict triangle lives in registers/VMEM.
        ones = jnp.ones((LANES, LANES), dtype=F32)
        s = jnp.dot(mf, ones, preferred_element_type=F32)  # [R,128] rowsums
        ri = jax.lax.broadcasted_iota(I32, (R, R), dimension=0)
        rj = jax.lax.broadcasted_iota(I32, (R, R), dimension=1)
        pre = jnp.dot(
            (rj < ri).astype(F32), s, preferred_element_type=F32
        )
        return (ps_f + pre).astype(I32)
    ps = ps_f.astype(I32)
    row_tot = jax.lax.broadcast_in_dim(ps[:, LANES - 1], m.shape, (0,))
    ri = jax.lax.broadcasted_iota(I32, m.shape, dimension=0)
    acc = row_tot
    sh = 1
    while sh < R:
        acc = acc + jnp.where(ri >= sh, _rollrows(acc, sh), 0)
        sh <<= 1
    return ps + (acc - row_tot)


def _rollrows(x, sh: int):
    """Cyclic roll down the sublane axis by a static amount."""
    return pltpu.roll(x, sh, 0)


DROP = np.int32(1 << 29)  # dropped marker: all movement bits are zero

# First packed-move round gated behind a runtime deficit check (see
# move_rounds in _fused_kernel): rounds 0..GATE-1 always run; rounds
# GATE.. run only if the block/part's dropped-element count reaches the
# round's bit value.
_MOVE_GATE_BIT = 11


def _move_compact(off, cols, nbits: int):
    """Stable left-move of elements by their per-element offset `off`
    (DROP = dropped: low `nbits` bits must be zero), decomposed bit-by-bit
    over flat shifts.  Monotone offsets of a stable compaction guarantee
    collision-freedom — the flat generalization of per-row rank/roll
    compaction.  The DROP encoding makes `moves in` a single bit test (a
    dropped or zero-filled source has the bit clear), and stale copies left
    behind by a move re-drop themselves via the same bit."""
    cols = list(cols)
    for b in range(nbits):
        sh = 1 << b
        off_in = _flat_shift_any(off, sh)
        valid_in = (off_in & sh) != 0
        cols = [
            jnp.where(valid_in, _flat_shift_any(c, sh), c) for c in cols
        ]
        off = jnp.where(
            valid_in,
            off_in - sh,
            jnp.where((off & sh) == 0, off, DROP),
        )
    return cols


def _lane_compact_slots(mask_i32, cols):
    """Per-128-lane-row left-pack (7 static rounds, full-tile ops).
    mask_i32: int32 0/1 (bool vectors don't concat/relayout on Mosaic).
    In-row ranks come from one MXU matmul; the move uses the DROP encoding
    (see _move_compact).  Returns (packed cols, per-row counts [R, 1])."""
    li = jax.lax.broadcasted_iota(I32, mask_i32.shape, dimension=1)
    ps = _lane_cumsum_mxu(mask_i32).astype(I32)
    cnt = ps[:, LANES - 1 :]
    off = jnp.where(mask_i32 != 0, li - (ps - 1), DROP)
    cols = list(cols)
    for j in range(7):
        sh = 1 << j
        off_in = pltpu.roll(off, LANES - sh, 1)
        valid_in = (li < LANES - sh) & ((off_in & sh) != 0)
        cols = [
            jnp.where(valid_in, pltpu.roll(c, LANES - sh, 1), c)
            for c in cols
        ]
        off = jnp.where(
            valid_in,
            off_in - sh,
            jnp.where((off & sh) == 0, off, DROP),
        )
    return cols, cnt


def _lane_compact_slots_u(mask_i32, cols, carry=None, obits=7):
    """Per-row left-pack like _lane_compact_slots, but the driver array
    packs (offset << obits | carry) in ONE i32, so the carried small
    payload moves for free with the offset bookkeeping — one fewer rolled
    array per round than driver+carry-column+payloads.

    carry must fit obits bits per element (default: the source lane, 7
    bits — non-HPC modes reconstruct the affine stream position from it;
    HPC modes pass the 17-bit block-relative position with obits=17).

    Returns (residual driver = carry value per slot, packed cols,
    per-row counts [R, 1])."""
    li = jax.lax.broadcasted_iota(I32, mask_i32.shape, dimension=1)
    if carry is None:
        carry = li
    ps = _lane_cumsum_mxu(mask_i32).astype(I32)
    cnt = ps[:, LANES - 1 :]
    u = jnp.where(mask_i32 != 0, ((li - (ps - 1)) << obits) | carry, 0)
    cols = list(cols)
    for j in range(7):
        sh = 1 << j
        shv = 1 << (obits + j)
        u_in = pltpu.roll(u, LANES - sh, 1)
        take = (li < LANES - sh) & ((u_in & shv) != 0)
        cols = [
            jnp.where(take, pltpu.roll(c, LANES - sh, 1), c) for c in cols
        ]
        u = jnp.where(
            take,
            u_in - shv,
            jnp.where((u & shv) == 0, u, 0),
        )
    return u, cols, cnt


def _fused_kernel(
    limit_ref,  # scalar prefetch: int32[B] window-start limit (rank space)
    length_ref,  # scalar prefetch: int32[B] raw read length
    base0_ref,  # scalar prefetch: int32[B] initial global kept rank (carry)
    codes_ref,  # (1, br, 128) uint8 main block
    pend0_ref,  # (1, 8, 128) int32 initial pending prefix (carry-in)
    *io_refs,  # start_out, [end_out,] hash_out, cnt_out, [pend_out,] scratch
    l: int,
    bound: int,
    strict: bool,
    do_hpc: bool,
    hpc_end: bool,
    emit_end: bool,
    emit_carry: bool,
    br: int,
    nt: int,
    nslots: int,
    rows_out: int,  # dense 128-lane survivor rows emitted per block
    width: int,  # hash lane width: 32 (NtHash1), 31 (NtHash2-31), 64 (H=u64)
    seed_f: np.ndarray,
    seed_r: np.ndarray,
    seed_f_hi: Optional[np.ndarray],  # high words when width == 64
    seed_r_hi: Optional[np.ndarray],
):
    io_refs = list(io_refs)
    start_out = io_refs.pop(0)
    end_out = io_refs.pop(0) if emit_end else None
    hash_out = io_refs.pop(0)
    hash_hi_out = io_refs.pop(0) if width == 64 else None
    cnt_out = io_refs.pop(0)
    pend_out = io_refs.pop(0) if emit_carry else None
    pend_ref, ext_ref, sm_ref = io_refs
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # Carry-in: the global kept rank + the pending prefix holding the
        # last l compacted (pos, code) elements of the stream BEFORE this
        # invocation's chunk (zeros for a whole-sequence scan).  This is
        # what makes the scan resumable across chunks of one long read
        # (single-chip streaming) and across 'seq' mesh shards (SPMD) —
        # the cross-chunk generalization of the reference's AVX-512 block
        # hand-off (src/nthash_avx512_32.rs:404-425).
        sm_ref[0] = base0_ref[b]
        pend_ref[0:8, :] = pend0_ref[0]

    base = sm_ref[0]
    length = length_ref[b]
    limit = limit_ref[b]

    P0 = 8 * LANES  # pending prefix: 8 aligned rows, data in row 7 only
    # main holds xcodes ((keep << 3) | code, constants.py): bit 3 is the
    # host-precomputed raw-byte-diff keep flag (full raw-byte identity,
    # like the reference's raw-byte run comparison at
    # src/nthash_hpc.rs:253-263 — and position-exact across block
    # boundaries with no previous-char carry); hashing and the packed
    # stream read only the low 3 code bits.
    main = codes_ref[0].astype(I32)  # [br, 128] xcodes
    ri = jax.lax.broadcasted_iota(I32, main.shape, dimension=0)
    li = jax.lax.broadcasted_iota(I32, main.shape, dimension=1)
    absj = t * (br * LANES) + ri * LANES + li

    if do_hpc:
        keep = ((main & 8) != 0) & (absj < length)
        keep_i = keep.astype(I32)
        rank = _flat_rank_inclusive(keep_i)
        pos_loc = ri * LANES + li
        nb = _nbits(br * LANES)

        def move_rounds(v, nbv, dmax):
            """Bit-decomposed packed move with the HIGH rounds gated at
            runtime: round b is an identity whenever 2^b exceeds dmax (the
            block/part's max rank deficit = its dropped-element count,
            monotone in position), so rounds above nbits(dmax) are skipped
            via pl.when — worth 1-3 of the ~nbv rounds on real data (e.g.
            random ACGT drops ~25%: bit 13 of a 14-bit in-part offset can
            never be set).  The gated rounds stage v through ext_ref
            (unused until the post-move carry phase)."""
            gate = min(_MOVE_GATE_BIT, nbv)

            def one_round(v, b_):
                shv = 1 << (17 + b_)
                v_in = _flat_shift_any(v, 1 << b_)
                take = (v_in & shv) != 0
                return jnp.where(
                    take,
                    v_in - shv,
                    jnp.where((v & shv) == 0, v, 0),
                )

            for b_ in range(gate):
                v = one_round(v, b_)
            if nbv > gate:
                ext_ref[0:br, :] = v
                for b_ in range(gate, nbv):

                    @pl.when(dmax >= (1 << b_))
                    def _(b_=b_):
                        ext_ref[0:br, :] = one_round(ext_ref[0:br, :], b_)

                v = ext_ref[0:br, :]
            return v

        if 17 + nb <= 31:
            # single-payload move: (off | code | in-block pos) packed in
            # one i32 — the compaction shifts ONE array per round instead
            # of two (off + data), ~halving the dominant HPC move cost.
            # Fields: pos 0..13, code 14..16, off 17..30; needs
            # br*LANES <= 2^14 (the pipeline uses block_rows=128 for HPC).
            cnt = jnp.sum(keep_i)  # scalar reduction (vector->scalar
            # extract of rank[-1, -1] is not lowerable on Mosaic)
            v = jnp.where(
                keep,
                ((pos_loc - (rank - 1)) << 17)
                | ((main & 7) << 14)
                | pos_loc,
                0,
            )
            v = move_rounds(v, nb, jnp.int32(br * LANES) - cnt)
            # pos field is the full low 14 bits (bits 0..13) regardless of
            # the block element count — masking with br*LANES-1 corrupts
            # positions whenever br*LANES is not a power of two.
            comp = (
                (t * (br * LANES) + (v & 0x3FFF)) << 3
            ) | (_shrl(v, 14) & 7)
        elif _parts_for(br) is not None:
            # N-part packed move (br=256: halves; br=512: quarters; ...):
            # each 16384-element part's survivors compact independently
            # with 14-bit in-part offsets (one payload array per round —
            # in-part offset <= in-part position, so elements never cross
            # backwards into the previous part and parts stay disjoint
            # through every round), then a binary tree of windowed dynamic
            # flat shifts splices sibling kept prefixes pairwise (log2
            # levels; the lower levels run on row-sliced sub-tiles, ~half
            # the vector cost of parts-1 full-tile splices).
            parts = _parts_for(br)
            prow = br // parts
            pbase = prow * LANES
            pidx = ri // prow  # part index of each element's row
            pos_p = pos_loc - pidx * pbase
            # per-part kept counts from row slices (no full-tile mask
            # multiplies); their sum replaces the full-tile cnt reduce.
            cnt_p = [
                jnp.sum(keep_i[j * prow : (j + 1) * prow])
                for j in range(parts)
            ]
            cnt = cnt_p[0]
            for j in range(1, parts):
                cnt = cnt + cnt_p[j]
            pref = jnp.zeros_like(rank)
            acc = jnp.int32(0)
            for j in range(1, parts):
                acc = acc + cnt_p[j - 1]
                pref = jnp.where(pidx == j, acc, pref)
            rk_p = rank - pref
            v = jnp.where(
                keep,
                ((pos_p - (rk_p - 1)) << 17)
                | ((main & 7) << 14)
                | pos_p,
                0,
            )
            cmin = cnt_p[0]
            for j in range(1, parts):
                cmin = jnp.minimum(cmin, cnt_p[j])
            v = move_rounds(v, _nbits(pbase), jnp.int32(pbase) - cmin)
            comp = (
                (
                    t * (br * LANES)
                    + pidx * pbase
                    + (v & 0x3FFF)  # full 14-bit pos field (see above)
                )
                << 3
            ) | (_shrl(v, 14) & 7)
            # splice tree: merge sibling prefixes pairwise
            sizes = cnt_p
            lvl_rows = prow
            while len(sizes) > 1:
                merged, nsizes = [], []
                pair_rows = lvl_rows * 2
                for h in range(len(sizes) // 2):
                    sub = (
                        comp[h * pair_rows : (h + 1) * pair_rows]
                        if len(sizes) > 2
                        else comp
                    )
                    c0, c1 = sizes[2 * h], sizes[2 * h + 1]
                    posl = (
                        jax.lax.broadcasted_iota(I32, sub.shape, 0) * LANES
                        + jax.lax.broadcasted_iota(I32, sub.shape, 1)
                    )
                    spl = _flat_shift_dyn(sub, lvl_rows * LANES - c0)
                    win = (posl >= c0) & (posl < c0 + c1)
                    merged.append(jnp.where(win, spl, sub))
                    nsizes.append(c0 + c1)
                comp = (
                    jnp.concatenate(merged, axis=0)
                    if len(merged) > 1
                    else merged[0]
                )
                sizes = nsizes
                lvl_rows = pair_rows
        else:  # very wide blocks: classic two-array move
            cnt = jnp.sum(keep_i)
            packed = (absj << 3) | (main & 7)
            off = jnp.where(keep, pos_loc - (rank - 1), DROP)
            (comp,) = _move_compact(off, [packed], nb)
    else:
        comp = (absj << 3) | (main & 7)
        cnt = jnp.int32(br * LANES)

    # 8-row pending prefix keeps every tile sublane-aligned (no {0,127}
    # vpad relayouts); only prefix row 7 carries data, rows 0-6 stay zero.
    ext = jnp.concatenate([pend_ref[0:8, :], comp], axis=0)  # [br+8, 128]

    # ---- hash over the carried + compacted stream ----
    ecode = ext & 7
    efl = jax.lax.broadcasted_iota(I32, ext.shape, dimension=0) * LANES + (
        jax.lax.broadcasted_iota(I32, ext.shape, dimension=1)
    )
    r_glob = base - P0 + efl  # global kept rank of each ext element
    h_hi = None
    if width == 32:
        rot_f = (-r_glob) & 31
        a_f = _rol32_lane(_seed_tree(seed_f, ecode), rot_f)
        a_r = _rol32_lane(_seed_tree(seed_r, ecode), r_glob & 31)
        wf = _sliding_window_xor_flat(a_f, l)
        wr = _sliding_window_xor_flat(a_r, l)
        fh = _rol32_lane(wf, (jnp.int32(l - 1) + r_glob) & 31)
        rh = _rol32_lane(wr, rot_f)
        h = _umin(fh, rh)
    elif width == 16:
        # H = u16 config (reference src/lib.rs:30): same algebra mod 16 on
        # low-half lanes (values stay < 2^16 through the XOR ladder).
        rot_f = (-r_glob) & 15
        a_f = _rol16_lane(_seed_tree(seed_f, ecode), rot_f)
        a_r = _rol16_lane(_seed_tree(seed_r, ecode), r_glob & 15)
        wf = _sliding_window_xor_flat(a_f, l)
        wr = _sliding_window_xor_flat(a_r, l)
        fh = _rol16_lane(wf, (jnp.int32(l - 1) + r_glob) & 15)
        rh = _rol16_lane(wr, rot_f)
        h = _umin(fh, rh)
    elif width == 64:
        # H = u64 config (reference src/lib.rs:32): identical XOR-scan
        # algebra on (hi, lo) int32 pairs — every rotate becomes a
        # conditional-swap 64-bit lane rotate, the window ladder runs per
        # word, canonical min and the density compare are pair compares.
        rot_f = (-r_glob) & 63
        af_hi, af_lo = _rol64_lane(
            _seed_tree(seed_f_hi, ecode), _seed_tree(seed_f, ecode), rot_f
        )
        ar_hi, ar_lo = _rol64_lane(
            _seed_tree(seed_r_hi, ecode),
            _seed_tree(seed_r, ecode),
            r_glob & 63,
        )
        wf_hi = _sliding_window_xor_flat(af_hi, l)
        wf_lo = _sliding_window_xor_flat(af_lo, l)
        wr_hi = _sliding_window_xor_flat(ar_hi, l)
        wr_lo = _sliding_window_xor_flat(ar_lo, l)
        rot_e = (jnp.int32(l - 1) + r_glob) & 63
        fh_hi, fh_lo = _rol64_lane(wf_hi, wf_lo, rot_e)
        rh_hi, rh_lo = _rol64_lane(wr_hi, wr_lo, rot_f)
        f_lt = _ult64(fh_hi, fh_lo, rh_hi, rh_lo)
        h_hi = jnp.where(f_lt, fh_hi, rh_hi)
        h = jnp.where(f_lt, fh_lo, rh_lo)
    else:  # 31-bit NtHash2 variant: the same algebra mod 31
        # reduce the carried scalar first so per-element values stay in
        # f32-exact mod range regardless of read length
        base31 = jax.lax.rem(base, jnp.int32(31))
        r31 = _mod31(base31 - P0 + efl)
        rot_f = _mod31(-r31 + 31)
        a_f = _rol31_lane(_seed_tree(seed_f, ecode), rot_f)
        a_r = _rol31_lane(_seed_tree(seed_r, ecode), r31)
        wf = _sliding_window_xor_flat(a_f, l)
        wr = _sliding_window_xor_flat(a_r, l)
        fh = _rol31_lane(wf, _mod31(jnp.int32((l - 1) % 31) + r31))
        rh = _rol31_lane(wr, rot_f)
        h = _umin(fh, rh)
    hcols = [h] if h_hi is None else [h_hi, h]  # hi first when present

    # Arithmetic shift: carried-in pending elements from a PREVIOUS chunk
    # keep chunk-relative (negative) positions; in-chunk packing is always
    # non-negative, so this is a no-op for whole-sequence scans.
    pos = ext >> 3
    if emit_end and do_hpc:
        # hpc: end = pos[f+l] - 1; hpcsimd: end = pos[f+l-1].  For the
        # regular/simd modes end == start + l - 1 is derived from the
        # packed start after the dense move and the full-tile column is
        # skipped entirely.
        if hpc_end:
            end_col = _flat_shift_any(pos, l) - 1
        else:
            end_col = _flat_shift_any(pos, l - 1)

    # ---- emission mask ----
    if width == 64:
        bnd_hi = jnp.int32(np.uint32((bound >> 32) & 0xFFFFFFFF).view(np.int32))
        bnd_lo = jnp.int32(np.uint32(bound & 0xFFFFFFFF).view(np.int32))
        passed = (
            _ult64(h_hi, h, bnd_hi, bnd_lo)
            if strict
            else ~_ult64(bnd_hi, bnd_lo, h_hi, h)
        )
    else:
        bnd = jnp.int32(np.uint32(bound).view(np.int32))
        passed = _ult(h, bnd) if strict else ~_ult(bnd, h)
    # A window is emitted by the block holding its LAST element, or its
    # ONE-PAST-LAST element when the end convention needs lookahead
    # (hpc_end: end = pos[f+l]-1, the scalar HPC iterator's convention).
    # The four positional bounds (in-block emission window + global rank
    # validity: r_glob = base - P0 + efl >= 0 and <= limit) are affine in
    # efl, so they fold into ONE scalar [lo, hi] interval — two vector
    # compares instead of four.
    f_lo = P0 - l if hpc_end else P0 - l + 1
    f_hi = P0 + cnt - l - (1 if hpc_end else 0)
    lo_s = jnp.maximum(jnp.int32(f_lo), jnp.int32(P0) - base)
    hi_s = jnp.minimum(f_hi, limit + (jnp.int32(P0) - base))
    mask = passed & (efl >= lo_s) & (efl <= hi_s)

    # ---- per-row slot compaction ----
    raw_total = jnp.sum(mask.astype(I32))
    if do_hpc and emit_end and _nbits(br * LANES) + 7 + 1 <= 31:
        # Split pack: survivors on the 8 carried prefix rows (only the
        # last ceil(l/128) rows can hold any) keep the general
        # driver+3-column pack on a tiny tile; main-row survivors pack
        # the BLOCK-RELATIVE start position (<= 17 bits) into the driver
        # itself, so only (end, hash) roll as payload — one fewer moved
        # array per round on ~98% of the tile.
        mask_i = mask.astype(I32)
        pb = _nbits(br * LANES)
        cols_pre, rc_pre = _lane_compact_slots(
            mask_i[:8],
            [pos[:8], end_col[:8]] + [c[:8] for c in hcols],
        )
        blk0 = t * (br * LANES)
        u_m, cols_m, rc_m = _lane_compact_slots_u(
            mask_i[8:],
            [end_col[8:]] + [c[8:] for c in hcols],
            carry=pos[8:] - blk0,
            obits=pb,
        )
        pos_main = blk0 + (u_m & ((1 << pb) - 1))
        packed_cols = [
            jnp.concatenate([a, b], axis=0)
            for a, b in zip(cols_pre, [pos_main] + list(cols_m))
        ]
        rc = jnp.concatenate([rc_pre, rc_m], axis=0)
    elif do_hpc:
        cols_in = (
            [pos, end_col] + hcols if emit_end else [pos] + hcols
        )
        packed_cols, rc = _lane_compact_slots(mask.astype(I32), cols_in)
    else:
        # non-HPC: stream position is affine in the ext flat index
        # (pos = t*br*128 + efl - P0, including carried-in prefix elements
        # with chunk-relative negative positions), so only the hash moves
        # as payload and the position is rebuilt from the recovered lane.
        u_col, h_cols, rc = _lane_compact_slots_u(
            mask.astype(I32), hcols
        )
        ri_s = jax.lax.broadcasted_iota(I32, u_col.shape, dimension=0)
        pos_col = t * (br * LANES) + (ri_s * LANES + u_col) - P0
        packed_cols = [pos_col] + list(h_cols)

    # ---- block-dense second level ----
    # The per-row slots are ~99% empty at production densities; writing
    # them to HBM (and re-reading in phase 2) costs more memory bandwidth
    # than the whole rest of the pipeline.  Gather each row's slot prefix
    # into a dense [GR, 128] tile (GR = sr/(128/NS) rows — 1/8 the main
    # tile at NS=16) and left-pack the block's survivors into `rows_out`
    # dense rows: the move runs over the small tile (13 rounds over 1/8
    # the elements), and slot HBM traffic shrinks by NS*sr/(rows_out*128)
    # (~5x at d=0.01).
    sr_rows = br + 8
    rpd = LANES // nslots  # ext rows packed per dense row
    GR = sr_rows // rpd
    li_s = jax.lax.broadcasted_iota(I32, (sr_rows, LANES), 1)
    valid = (li_s < jnp.minimum(rc, nslots)).astype(I32)

    def gather_dense(c):
        v = c.reshape(GR, rpd, LANES)
        lid = jax.lax.broadcasted_iota(I32, (GR, LANES), 1)
        out = jnp.zeros((GR, LANES), dtype=I32)
        for kq in range(rpd):
            seg = (lid >= kq * nslots) & (lid < (kq + 1) * nslots)
            out = jnp.where(
                seg, pltpu.roll(v[:, kq, :], kq * nslots, 1), out
            )
        return out

    dm = gather_dense(valid)
    dcols = [gather_dense(c) for c in packed_cols]
    drank = _flat_rank_inclusive(dm)
    kept_total = jnp.sum(dm)
    ri_d = jax.lax.broadcasted_iota(I32, dm.shape, dimension=0)
    li_d = jax.lax.broadcasted_iota(I32, dm.shape, dimension=1)
    doff = jnp.where(
        dm != 0, (ri_d * LANES + li_d) - (drank - 1), DROP
    )
    dcols = _move_compact(doff, dcols, _nbits(GR * LANES))

    def _take(c):  # first rows_out rows, zero-padded if GR < rows_out
        if rows_out <= GR:
            return c[:rows_out]
        return jnp.concatenate(
            [c, jnp.zeros((rows_out - GR, LANES), dtype=I32)], axis=0
        )

    if emit_end and do_hpc:
        ds_, de_, *dh = dcols
    else:
        ds_, *dh = dcols
        if emit_end:  # non-HPC windows always span exactly l chars
            de_ = ds_ + (l - 1)
    if emit_end:
        end_out[0] = _take(de_)
    start_out[0] = _take(ds_)
    hash_out[0] = _take(dh[-1])  # low word (the full hash when width<=32)
    if width == 64:
        hash_hi_out[0] = _take(dh[0])
    cnt_out[0] = jnp.concatenate(
        [
            jnp.full((1, LANES), kept_total, dtype=I32),
            jnp.full((1, LANES), raw_total, dtype=I32),
            jnp.full((1, LANES), cnt, dtype=I32),  # kept STREAM elements
            jnp.zeros((5, LANES), dtype=I32),
        ],
        axis=0,
    )

    # ---- carry update ----
    # new pending = last l elements of the ext stream, right-aligned into
    # the last carry_rows 128-lane rows of the pending prefix: flat source
    # positions [P0+cnt-l, P0+cnt).  One row suffices for l <= 127; two for
    # l <= 255 (the reference scalar HPC ring buffer is 256 chars,
    # src/nthash_hpc.rs:9-11).  Lanes before the window's first element may
    # hold wrapped garbage — harmless, since every window touching them is
    # masked out by f_lo = P0 - l.
    ext_ref[: br + 8, :] = ext
    ext_ref[pl.ds(br + 8, 1), :] = jnp.zeros((1, LANES), dtype=I32)
    carry_rows = 1 if l <= LANES - 1 else 2
    src0 = P0 + cnt - l  # first source flat position
    li1 = jax.lax.broadcasted_iota(I32, (1, LANES), dimension=1)
    for j in range(carry_rows):
        # out row (8 - carry_rows + j): out[d] = ext_flat[start + d]
        start = src0 + j * LANES - (carry_rows * LANES - l)
        r0 = start // LANES
        lane0 = start % LANES
        two = ext_ref[pl.ds(r0, 2), :]  # [2, 128]
        rot = pltpu.roll(two, (LANES - lane0 % LANES) % LANES, 1)
        takes_row1 = li1 >= (LANES - lane0)
        row = 8 - carry_rows + j
        pend_ref[row : row + 1, :] = jnp.where(
            takes_row1, rot[1:2], rot[0:1]
        )

    sm_ref[0] = base + cnt

    if emit_carry:
        # Carry-out after the final block: the pending prefix for the NEXT
        # chunk of this read.  Positions are chunk-local; the caller
        # rebases by subtracting (chunk_len << 3) from the packed values.
        @pl.when(t == nt - 1)
        def _():
            pend_out[0] = pend_ref[0:8, :]


def _nbits(n: int) -> int:
    return int(n - 1).bit_length()


def _parts_for(br: int):
    """Number of <=16384-element parts for the N-part packed HPC move
    (14-bit in-part offsets + 14-bit in-part pos + 3-bit code fit one
    i32), or None if br doesn't split evenly."""
    n = -(-(br * LANES) // (1 << 14))
    p = 1
    while p < n:
        p <<= 1
    return p if br % p == 0 and p > 1 else None


@functools.partial(
    jax.jit,
    static_argnames=(
        "l",
        "bound",
        "strict",
        "do_hpc",
        "hpc_end",
        "emit_end",
        "emit_carry",
        "nslots",
        "block_rows",
        "interpret",
        "variant",
        "rows_out",
        "hash_width",
    ),
)
def fused_minimizer_scan(
    codes: jnp.ndarray,  # uint8[B, L] base codes (CODE_PAD beyond lengths)
    lengths: jnp.ndarray,  # int32[B]
    limit: jnp.ndarray,  # int32[B] max valid window-start rank (inclusive)
    l: int,
    bound: int,
    strict: bool,
    do_hpc: bool,
    hpc_end: bool,
    emit_end: bool = True,
    nslots: int = 16,
    block_rows: int = 256,
    interpret: bool = False,
    variant: str = "nthash1",
    rows_out: int = 0,  # dense survivor rows per block (0 = lossless max)
    base0: Optional[jnp.ndarray] = None,  # int32[B] carry-in kept rank
    pend0: Optional[jnp.ndarray] = None,  # int32[B, 8, 128] carry-in prefix
    emit_carry: bool = False,  # also return the carry-out pending prefix
    hash_width: int = 32,  # 32 (H=u32) or 64 (H=u64; hash returned as pair)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused pass -> block-dense survivor rows.

    Returns (start int32[B, nt*rows_out, 128], end (None when
    emit_end=False — ends are then start + l - 1), hash ... (u32 bit
    patterns), counts int32[B, nt, 3], [pend_out int32[B, 8, 128] when
    emit_carry]).  Block t's survivors are the first counts[b, t, 0]
    elements of its rows_out dense rows, in sequence order;
    counts[b, t, 1] is the RAW selected count (> kept implies per-row slot
    or block-capacity overflow — never silent); counts[b, t, 2] is the
    block's kept STREAM element count (== block size for non-HPC modes),
    whose sum is the carry-out base rank for a following chunk.

    rows_out bounds the dense survivor capacity per block (rows_out*128
    elements); callers size it from the density like the per-row slots
    (see ops/pipeline.py).  0 keeps the lossless maximum.

    variant="nthash2" switches the hash lanes to the 31-bit NtHash2-hybrid
    scheme (reference src/nthash2_avx512_32.rs, for l > 31 where 32-bit
    NtHash1 degenerates).  l may go up to 255 (matching the reference
    scalar HPC ring buffer, src/nthash_hpc.rs:9-11).

    base0/pend0 resume the scan mid-read: base0[b] is the global kept rank
    before this chunk and pend0[b] the packed ((pos << 3) | code) pending
    prefix holding the last min(base0, l) stream elements right-aligned in
    its 8x128 flat layout, with positions RELATIVE to this chunk's origin
    (negative for carried elements).  Both default to zeros (fresh read).
    Emission masks are global-rank-aware, so each chunk emits exactly the
    windows whose final (or one-past-final, hpc mode) element lies inside
    it — no window is emitted twice across chunks.
    """
    if not (2 <= l <= 255):
        raise ValueError(f"l={l} must be in [2, 255] for the fused kernel")
    B, L = codes.shape
    if L >= (1 << 28):
        raise ValueError("padded length must be < 2^28 (positions are packed)")
    block_rows = max(8, min(block_rows, -(-L // LANES)))
    if L % (block_rows * LANES):
        pad = -(-L // (block_rows * LANES)) * (block_rows * LANES) - L
        from ...constants import CODE_PAD

        codes = jnp.pad(codes, ((0, 0), (0, pad)), constant_values=CODE_PAD)
        L += pad
    rows = L // LANES
    br = block_rows
    nt = rows // br
    sr = br + 8  # ext rows (8-row pending prefix + br main) — aligned
    # the dense gather needs 128 % nslots == 0 and (128//nslots) | sr
    while LANES % nslots or sr % (LANES // nslots):
        nslots += 8
    gr = sr * nslots // LANES  # dense slot rows per block (lossless max)
    rows_out = gr if rows_out <= 0 else min(rows_out, gr)
    rows_out = -(-rows_out // 8) * 8  # sublane-aligned output blocks

    main_spec = pl.BlockSpec(
        (1, br, LANES), lambda b, t, *_: (b, t, 0), memory_space=pltpu.VMEM
    )
    slot_spec = pl.BlockSpec(
        (1, rows_out, LANES),
        lambda b, t, *_: (b, t, 0),
        memory_space=pltpu.VMEM,
    )
    cnt_spec = pl.BlockSpec(
        (1, 8, LANES), lambda b, t, *_: (b, t, 0), memory_space=pltpu.VMEM
    )
    pend_spec = pl.BlockSpec(
        (1, 8, LANES), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )
    if base0 is None:
        base0 = jnp.zeros((B,), dtype=I32)
    if pend0 is None:
        pend0 = jnp.zeros((B, 8, LANES), dtype=I32)

    if hash_width not in (16, 32, 64):
        raise ValueError(
            f"fused kernel hash_width must be 16/32/64, got {hash_width}"
        )
    seed_f_hi = seed_r_hi = None
    if variant == "nthash2":
        from ...constants import seed_tables_nthash2_31

        if hash_width != 32:
            raise ValueError("nthash2 variant requires hash_width=32")
        seed_f, seed_r = seed_tables_nthash2_31()
        width = 31
    elif hash_width == 16:
        from ...constants import seed_tables

        f16, r16 = seed_tables(16)
        seed_f = f16.astype(np.uint32)
        seed_r = r16.astype(np.uint32)
        width = 16
    elif hash_width == 64:
        from ...constants import seed_tables

        f64, r64 = seed_tables(64)
        seed_f = (f64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        seed_f_hi = (f64 >> np.uint64(32)).astype(np.uint32)
        seed_r = (r64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        seed_r_hi = (r64 >> np.uint64(32)).astype(np.uint32)
        width = 64
    else:
        seed_f, seed_r = SEED_TABLE_F, SEED_TABLE_R
        width = 32
    kernel = functools.partial(
        _fused_kernel,
        l=l,
        bound=bound,
        strict=strict,
        do_hpc=do_hpc,
        hpc_end=hpc_end,
        emit_end=emit_end,
        emit_carry=emit_carry,
        br=br,
        nt=nt,
        nslots=nslots,
        rows_out=rows_out,
        width=width,
        seed_f=seed_f,
        seed_r=seed_r,
        seed_f_hi=seed_f_hi,
        seed_r_hi=seed_r_hi,
    )
    n_slot_arrays = (3 if emit_end else 2) + (1 if width == 64 else 0)
    out_specs = [slot_spec] * n_slot_arrays + [cnt_spec]
    out_shapes = [
        jax.ShapeDtypeStruct((B, nt * rows_out, LANES), I32)
    ] * n_slot_arrays + [jax.ShapeDtypeStruct((B, nt * 8, LANES), I32)]
    if emit_carry:
        out_specs.append(pend_spec)
        out_shapes.append(jax.ShapeDtypeStruct((B, 8, LANES), I32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nt),
        in_specs=[main_spec, pend_spec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((8, LANES), I32),
            pltpu.VMEM((br + 16, LANES), I32),
            pltpu.SMEM((1,), I32),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        limit.astype(I32),
        lengths.astype(I32),
        base0.astype(I32),
        codes.reshape(B, rows, LANES),
        pend0,
    )
    outs = list(outs)
    start = outs.pop(0)
    end = outs.pop(0) if emit_end else None
    hsh = outs.pop(0)
    if width == 64:  # hash returned as a (hi, lo) pair of int32 arrays
        hsh = (outs.pop(0), hsh)
    cnts = outs.pop(0)
    # [B, nt, (kept survivors, raw selected, kept stream)]
    counts = cnts.reshape(B, nt, 8, LANES)[:, :, :3, 0]
    if emit_carry:
        return start, end, hsh, counts, outs.pop(0)
    return start, end, hsh, counts
