"""The end-to-end batched k-min-mer pipeline (jit-compatible, TPU-native).

Dataflow (one fused jit program; compare reference call stack §3 of
SURVEY.md — the pull-iterator chain becomes a push/batch dataflow):

    codes[B, L], lengths[B]
      └─ (hpc modes) hpc keep-mask → compaction → hpc_codes + orig positions
      └─ sliding canonical NtHash1-32 (XOR-scan)        [ops/nthash.py]
      └─ density threshold (per-mode comparator/bound)  → selection mask
      └─ compaction of (start, end, hash) minimizer stream
      └─ xorshift mixhash (u64 as u32-pairs) + k-window XOR-scan assembly
      └─ KminmerBatch{hash_hi, hash_lo, start, end, rev, counts}

Per-mode conventions reproduced bit-for-bit (see oracle.py for the
file:line provenance of each rule):
  regular : all windows, `hash <= f64-bound`, start=i, end=i+l-1
  simd    : all windows, `hash <  f32-bound`, start=i, end=i+l-1
  hpc     : drops the last HPC window, `hash <= f64-bound`,
            start=run_start[i], end=run_start[i+l]-1
  hpcsimd : all windows, `hash <  f32-bound`,
            start=run_start[i], end=run_start[i+l-1]
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import (
    CODE_PAD,
    hash_bound,
    hash_bound_simd_u32,
    hash_bound_u32,
)
from .assemble import assemble_kminmers, assemble_kminmers_mixed
from .compact import I32, compact
from .hpc import hpc_compress
from .nthash import sliding_nthash16, sliding_nthash32, sliding_nthash64
from .u64 import U32, lt2, mix64_murmur_from_u16


@dataclasses.dataclass(frozen=True)
class PipelineSpec:
    """Static configuration of one compiled pipeline.

    Replaces the reference's compile-time type aliases + runtime args
    (src/lib.rs:29-39,89).  `max_minimizers` is the static capacity M of the
    compacted minimizer stream per read; selected minimizers beyond M are
    dropped (detectable via KminmerBatch.n_minimizers_raw).

    l limits — a DELIBERATE extension over the reference: the reference
    asserts l <= 31 in its SIMD paths (src/nthash_avx512_32.rs:33, because
    32-bit NtHash1 rotations degenerate for l >= 32) and l < 256 in the
    scalar HPC path (BUFLEN=256, src/nthash_hpc.rs:9-11).  This pipeline
    accepts l up to 255 for EVERY mode: the fused kernel's carry covers
    l <= 255, and for l > 31 the variant="nthash2" 31-bit scheme gives
    non-degenerate hashes.  The reference's own limits are enforced only
    at the API layer (api.kminmers_list strict_limits=True, the default),
    so reference-compatible callers get reference-compatible errors while
    the pipeline itself is more general.
    """

    l: int
    k: int
    density: float
    mode: str = "regular"  # regular | hpc | simd | hpcsimd
    max_minimizers: Optional[int] = None
    compaction: str = "auto"
    # Minimizer hash precision: the reference's compile-time H (u16/u32/u64,
    # src/lib.rs:30-32) as runtime config.  SIMD modes are u32-only, like
    # the reference's 32-bit AVX-512 kernels.
    hash_width: int = 32
    # "nthash1" (default) or "nthash2" — the 31-bit-rotate hybrid
    # (reference src/nthash2_avx512_32.rs) for l > 31 support.
    variant: str = "nthash1"
    # Survivor slots per 128-lane row in the fused kernel (None = derived
    # from density).  Raised by the overflow-recovery retry loop (api.py)
    # when a dense region overflows its row's slots.
    slots: Optional[int] = None
    # Dense survivor rows per block in the fused kernel (None = derived
    # from density).  Also escalated by the retry loop: a low-complexity
    # region can overflow the block capacity even with roomy row slots
    # (the reference's drain buffers simply grow,
    # src/nthash_avx512_32.rs:139-141 — recovery must too).
    rows_out: Optional[int] = None

    def __post_init__(self):
        if self.mode not in ("regular", "hpc", "simd", "hpcsimd"):
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.l < 1 or self.k < 1:
            raise ValueError("l and k must be >= 1")
        if self.hash_width not in (16, 32, 64):
            raise ValueError(f"hash_width must be 16/32/64, got {self.hash_width}")
        if self.hash_width != 32 and self.mode in ("simd", "hpcsimd"):
            raise ValueError("SIMD modes require hash_width=32")
        if self.variant not in ("nthash1", "nthash2"):
            raise ValueError(f"unknown variant {self.variant!r}")
        if self.variant == "nthash2" and self.hash_width != 32:
            raise ValueError("nthash2 variant is 32-bit-lane only")

    @property
    def strict_threshold(self) -> bool:
        # SIMD paths use `<` (src/nthash_avx512_32.rs:55,130); scalar `<=`.
        return self.mode in ("simd", "hpcsimd")

    @property
    def bound(self) -> int:
        if self.variant == "nthash2":
            # 31-bit hash space: halved bounds (src/nthash2_avx512_32.rs:54)
            from ..constants import hash_bound_nthash2_31

            if self.strict_threshold:
                return hash_bound_nthash2_31(self.density)
            return hash_bound_u32(self.density) // 2
        if self.strict_threshold:
            return hash_bound_simd_u32(self.density)
        if self.hash_width != 32:
            return hash_bound(self.density, self.hash_width)
        return hash_bound_u32(self.density)

    @property
    def is_hpc(self) -> bool:
        return self.mode in ("hpc", "hpcsimd")

    def capacity_for(self, length: int) -> int:
        if self.max_minimizers is not None:
            return max(self.max_minimizers, self.k)
        nwin = max(length - self.l + 1, 1)
        est = int(nwin * max(self.density, 0.0) * 4.0) + 128
        return min(max(est, self.k), nwin)


def default_rows_out(density: float, block_rows: int = 256) -> int:
    """Dense per-block survivor capacity (in 128-lane rows) derived from
    the density: binomial mean + generous tail.  Slot/capacity overflow is
    detected via counts and recovered by the api retry loop."""
    blk = block_rows * 128
    mean = blk * max(density, 0.0)
    return int(
        min(
            -(-(2.0 * mean + 5.0 * (mean ** 0.5) + 192.0) // 128),
            -(-blk // 128),
        )
    )


class KminmerBatch(NamedTuple):
    """Structured batch of k-min-mer records (reference KminmerHash,
    src/kminmer.rs:129-135, as a struct-of-arrays).  The first
    n_kminmers[b] entries of each row are valid, in sequence order; entry w
    has offset == w (src/lib.rs:258-259)."""

    hash_hi: jnp.ndarray  # uint32[B, Mk]
    hash_lo: jnp.ndarray  # uint32[B, Mk]
    start: jnp.ndarray  # int32[B, Mk]
    end: jnp.ndarray  # int32[B, Mk]
    rev: jnp.ndarray  # bool[B, Mk]
    n_kminmers: jnp.ndarray  # int32[B]
    # The intermediate minimizer stream (exposed like the reference's L2
    # iterators are public API):
    min_hash: jnp.ndarray  # uint32[B, M] (low 32 bits when hash_width=64)
    min_hash_hi: jnp.ndarray  # uint32[B, M] (zeros unless hash_width=64)
    min_start: jnp.ndarray  # int32[B, M]
    min_end: jnp.ndarray  # int32[B, M]
    n_minimizers: jnp.ndarray  # int32[B] (clipped to M)
    n_minimizers_raw: jnp.ndarray  # int32[B] (unclipped; > M means overflow)


def kminmer_pipeline(
    codes: jnp.ndarray, lengths: jnp.ndarray, spec: PipelineSpec
) -> KminmerBatch:
    """codes: uint8[B, L] (CODE_PAD beyond lengths), lengths: int32[B]."""
    B, L = codes.shape
    l, k = spec.l, spec.k
    if L < l + 1:
        raise ValueError(f"padded length {L} must exceed l={l}")
    lengths = lengths.astype(I32)

    use_fused = (
        (
            spec.compaction in ("auto", "pallas")
            and jax.default_backend() == "tpu"
        )
        or spec.compaction == "fused_interpret"
    ) and 2 <= l <= 255 and spec.hash_width in (16, 32, 64)
    if use_fused:
        return _fused_pipeline(codes, lengths, spec)

    if spec.is_hpc:
        hcodes, pos, hlen = hpc_compress(codes, lengths, spec.compaction)
        hash_input, eff_len = hcodes, hlen
    else:
        hash_input, eff_len = codes, lengths

    if spec.variant == "nthash2":
        from .nthash import sliding_nthash2_31

        fh, rh = sliding_nthash2_31(hash_input, l)
        h = jnp.minimum(fh, rh)
        h_hi = None
    elif spec.hash_width == 64:
        fh64, rh64 = sliding_nthash64(hash_input, l)
        from .u64 import min2

        h_hi, h_lo = min2(fh64, rh64)
        h = h_lo  # compared as a pair below
    elif spec.hash_width == 16:
        fh, rh = sliding_nthash16(hash_input, l)
        h = jnp.minimum(fh, rh)
        h_hi = None
    else:
        fh, rh = sliding_nthash32(hash_input, l)
        h = jnp.minimum(fh, rh)
        h_hi = None
    nwin = L - l + 1
    i = jnp.arange(nwin, dtype=I32)[None, :]

    # Whole-read gate: no sub-iterator unless seq len > l (src/lib.rs:97).
    gate = (lengths > l)[:, None]
    if spec.mode == "hpc":
        valid = i < (eff_len - l)[:, None]  # last HPC window never emitted
    else:
        valid = i <= (eff_len - l)[:, None]

    if spec.hash_width == 64:
        b_hi = jnp.asarray((spec.bound >> 32) & 0xFFFFFFFF, dtype=U32)
        b_lo = jnp.asarray(spec.bound & 0xFFFFFFFF, dtype=U32)
        bound_pair = (
            jnp.broadcast_to(b_hi, h_hi.shape),
            jnp.broadcast_to(b_lo, h.shape),
        )
        # scalar paths use `<=` (src/nthash_hpc.rs:277, src/lib.rs:228)
        passed = ~lt2(bound_pair, (h_hi, h))
    else:
        bound = jnp.asarray(spec.bound, dtype=U32)
        passed = (h < bound) if spec.strict_threshold else (h <= bound)
    sel = gate & valid & passed

    if spec.is_hpc:
        start = pos[:, :nwin]
        if spec.mode == "hpc":
            # end = first original index after the window's last run, minus 1
            pos_ext = jnp.concatenate(
                [pos, jnp.full((B, 1), L, dtype=I32)], axis=-1
            )
            end = pos_ext[:, l : l + nwin] - 1
        else:
            end = pos[:, l - 1 : l - 1 + nwin]
    else:
        start = jnp.broadcast_to(i, (B, nwin))
        end = start + (l - 1)

    m_cap = spec.capacity_for(L)
    if m_cap < k:
        raise ValueError(f"minimizer capacity {m_cap} < k={k}")
    cols = [start, end, h]
    fills = [I32(0), I32(0), U32(0)]
    if spec.hash_width == 64:
        cols.append(h_hi)
        fills.append(U32(0))
    compacted, n_raw = compact(sel, cols, m_cap, fills, method=spec.compaction)
    min_start, min_end, min_hash = compacted[:3]
    min_hash_hi = (
        compacted[3]
        if spec.hash_width == 64
        else jnp.zeros_like(min_hash)
    )
    n_min = jnp.minimum(n_raw, m_cap)

    if spec.hash_width == 64:
        # MixHash for u64 is the identity (src/lib.rs:171-177).
        (kh_hi, kh_lo), rev = assemble_kminmers_mixed(
            (min_hash_hi, min_hash), k
        )
    elif spec.hash_width == 16:
        (kh_hi, kh_lo), rev = assemble_kminmers_mixed(
            mix64_murmur_from_u16(min_hash), k
        )
    else:
        (kh_hi, kh_lo), rev = assemble_kminmers(min_hash, k)
    mk = m_cap - k + 1
    n_km = jnp.maximum(n_min - (k - 1), 0)
    w = jnp.arange(mk, dtype=I32)[None, :]
    km_valid = w < n_km[:, None]
    zero32 = jnp.zeros((), dtype=U32)
    return KminmerBatch(
        hash_hi=jnp.where(km_valid, kh_hi, zero32),
        hash_lo=jnp.where(km_valid, kh_lo, zero32),
        start=jnp.where(km_valid, min_start[:, :mk], 0),
        end=jnp.where(km_valid, min_end[:, k - 1 :], 0),
        rev=km_valid & rev,
        n_kminmers=n_km,
        min_hash=min_hash,
        min_hash_hi=min_hash_hi,
        min_start=min_start,
        min_end=min_end,
        n_minimizers=n_min,
        n_minimizers_raw=n_raw,
    )


def _phase2_compact(st, en, hs, counts, m_cap, emit_end, l, interpret):
    """Global ordered compaction of the fused kernel's block-dense survivor
    rows into a [B, m_cap] minimizer stream.  n_raw counts every selected
    minimizer (exact even on overflow; n_raw > n_min implies loss — slot /
    block capacity or m_cap).  Shared by the batch pipeline and the chunked
    long-read driver (ops/long_read.py)."""
    hs_hi = None
    if isinstance(hs, tuple):  # hash_width=64: (hi, lo) int32 pair
        hs_hi, hs = hs
    B, SB, _ = st.shape
    NT = counts.shape[1]
    RO = SB // NT
    kept = jnp.minimum(counts[:, :, 0], RO * 128)
    n_raw = counts[:, :, 1].sum(axis=1)
    slot_valid = (
        jnp.arange(RO * 128, dtype=I32)[None, None, :]
        < kept[:, :, None]
    )
    sv = slot_valid.reshape(B, SB * 128)
    slot_cols = [st.reshape(B, SB * 128), hs.reshape(B, SB * 128)]
    if hs_hi is not None:
        slot_cols.append(hs_hi.reshape(B, SB * 128))
    if emit_end:
        slot_cols.insert(1, en.reshape(B, SB * 128))
    # The compacted stream can never exceed the slot count, so very large
    # requested capacities (giant single-chunk long reads) clamp to it;
    # columns are zero-padded back to m_cap below.
    m_eff = min(m_cap, SB * 128)
    # Streaming-Pallas output capacity lives whole in VMEM
    # ((ceil(m_eff/128)+10) rows per column); past ~24 MB total the
    # compile blows up (observed at 64 Mb chunks: m_eff ~2.8M never
    # finished compiling), so huge capacities take the XLA bsearch path —
    # off the hot loop, these shapes occur once per jumbo chunk.
    mr_bytes = (-(-m_eff // 128) + 10) * 128 * 4 * (len(slot_cols) + 1)
    # Dense one-block compaction requires the whole slot row (+ working
    # copies) to fit scoped VMEM (~16 MB): gate on total live estimate.
    if SB * 128 * (len(slot_cols) + 1) * 4 * 5 <= 12 * (1 << 20):
        from .pallas.slot_compact import slot_compact

        packed, n_slotted = slot_compact(
            sv, slot_cols, m_eff, interpret=interpret
        )
        packed = [p[:, :m_eff] for p in packed]
    else:
        method = "pallas" if mr_bytes <= 24 * (1 << 20) else "bsearch"
        packed, n_slotted = compact(
            sv, slot_cols, m_eff, [I32(0)] * len(slot_cols), method=method
        )
    if m_eff < m_cap:
        packed = [
            jnp.pad(p, ((0, 0), (0, m_cap - m_eff))) for p in packed
        ]
    packed = list(packed)
    min_start = packed.pop(0)
    min_end = packed.pop(0) if emit_end else min_start + (l - 1)
    min_hash_i = packed.pop(0)
    if hs_hi is not None:
        min_hash_i = (packed.pop(0), min_hash_i)  # (hi, lo)
    n_min = jnp.minimum(n_slotted, m_cap)
    return min_start, min_end, min_hash_i, n_min, n_raw


def _fused_pipeline(
    codes: jnp.ndarray, lengths: jnp.ndarray, spec: PipelineSpec
) -> KminmerBatch:
    """TPU fast path: ONE fused Pallas pass over the raw codes (in-kernel
    HPC + NtHash + select + per-row slot compaction, ops/pallas/
    fused_scan.py) + a small second compaction of the slot arrays; only the
    [B, M] assembly stage stays in XLA."""
    from .pallas.fused_scan import fused_minimizer_scan, slots_for_density

    B, L = codes.shape
    l, k = spec.l, spec.k

    # Window-start limit per mode (gate: no windows unless orig len > l,
    # src/lib.rs:97; hpc mode drops the last HPC window).  For the HPC
    # modes no separate keep-mask pre-pass is needed: the kernel's kept
    # stream ends exactly at the HPC length (pad/beyond-length chars are
    # never kept), so its per-block "window fully inside the kept stream"
    # bound already enforces i <= eff_len - l (hpcsimd), and the hpc-mode
    # one-past-last-element emission convention drops the final window
    # (i < eff_len - l) without ever knowing eff_len.  Only the raw-length
    # gate remains.  Non-HPC modes hash every padded position, so they
    # still need the explicit per-read window limit.
    if spec.is_hpc:
        limit = jnp.where(lengths > l, jnp.int32(1 << 30), -1).astype(I32)
    else:
        limit = jnp.where(lengths > l, lengths - l, -1).astype(I32)

    m_cap = spec.capacity_for(L)
    if m_cap < k:
        raise ValueError(f"minimizer capacity {m_cap} < k={k}")
    interpret = jax.default_backend() != "tpu"
    nslots = (
        min(128, -(-spec.slots // 8) * 8)
        if spec.slots is not None
        else slots_for_density(spec.density)
    )
    # Per-block fixed costs (pending prefix, carry, dense second level,
    # counts) amortize with block size — measured on-chip r3: regular
    # 5.80 (br=256) -> 7.63 GB/s (br=1024, with the packed-driver slot
    # pack); hpc 4.37 (br=256) -> best at br=512 via the N-part packed
    # move (4x 16384-element parts).  Gains flatten past these points
    # while VMEM pressure and compile time grow.  hash_width=64 doubles
    # the live hash-lane arrays (hi/lo pairs), so blocks halve.
    if spec.hash_width == 64:
        block_rows = 256 if spec.is_hpc else 512
    else:
        block_rows = 512 if spec.is_hpc else 1024
    # Dense block capacity: like slots_for_density but per-block
    # (binomial mean + generous tail); slot/capacity overflow is
    # detected via counts and recovered by the api retry loop.
    rows_out = (
        spec.rows_out
        if spec.rows_out is not None
        else default_rows_out(spec.density, block_rows)
    )
    # regular/simd: end == start + l - 1, derived after compaction — the
    # whole end column is skipped through both kernels.
    emit_end = spec.is_hpc
    st, en, hs, counts = fused_minimizer_scan(
        codes,
        lengths,
        limit,
        l,
        int(spec.bound),
        spec.strict_threshold,
        spec.is_hpc,
        spec.mode == "hpc",
        emit_end=emit_end,
        nslots=nslots,
        block_rows=block_rows,
        interpret=interpret,
        variant=spec.variant,
        rows_out=rows_out,
        hash_width=spec.hash_width,
    )
    min_start, min_end, min_hash_i, n_min, n_raw = _phase2_compact(
        st, en, hs, counts, m_cap, emit_end, l, interpret
    )
    valid = jnp.arange(m_cap, dtype=I32)[None, :] < n_min[:, None]
    min_start = jnp.where(valid, min_start, 0)
    min_end = jnp.where(valid, min_end, 0)
    if spec.hash_width == 64:
        hi_i, lo_i = min_hash_i
        min_hash = jnp.where(
            valid, jax.lax.bitcast_convert_type(lo_i, U32), U32(0)
        )
        min_hash_hi = jnp.where(
            valid, jax.lax.bitcast_convert_type(hi_i, U32), U32(0)
        )
        # MixHash for u64 is the identity (src/lib.rs:171-177); the
        # minimizer-space window hash runs on the (hi, lo) pair.
        (kh_hi, kh_lo), rev = assemble_kminmers_mixed(
            (min_hash_hi, min_hash), k
        )
    else:
        min_hash = jnp.where(
            valid, jax.lax.bitcast_convert_type(min_hash_i, U32), U32(0)
        )
        min_hash_hi = jnp.zeros_like(min_hash)

        if spec.hash_width == 16:
            (kh_hi, kh_lo), rev = assemble_kminmers_mixed(
                mix64_murmur_from_u16(min_hash), k
            )
        else:
            from .pallas.assemble_kernel import assemble_kminmers_pallas

            (kh_hi, kh_lo), rev = assemble_kminmers_pallas(
                min_hash, k, interpret=interpret
            )
    mk = m_cap - k + 1
    n_km = jnp.maximum(n_min - (k - 1), 0)
    w = jnp.arange(mk, dtype=I32)[None, :]
    km_valid = w < n_km[:, None]
    zero32 = jnp.zeros((), dtype=U32)
    return KminmerBatch(
        hash_hi=jnp.where(km_valid, kh_hi, zero32),
        hash_lo=jnp.where(km_valid, kh_lo, zero32),
        start=jnp.where(km_valid, min_start[:, :mk], 0),
        end=jnp.where(km_valid, min_end[:, k - 1 :], 0),
        rev=km_valid & rev,
        n_kminmers=n_km,
        min_hash=min_hash,
        min_hash_hi=min_hash_hi,
        min_start=min_start,
        min_end=min_end,
        n_minimizers=n_min,
        n_minimizers_raw=n_raw,
    )


def make_pipeline(spec: PipelineSpec):
    """Returns a jitted fn(codes[B, L], lengths[B]) -> KminmerBatch."""

    def fn(codes, lengths):
        return kminmer_pipeline(codes, lengths, spec)

    return jax.jit(fn)
