"""Correctness tests for the fused single-pass minimizer kernel
(ops/pallas/fused_scan.py) — the production hot path — in interpret mode
on the CPU test mesh, validated element-exactly against the numpy oracle.

The kernel fuses the reference's entire L1+L2 layer (HPC + rolling NtHash +
density select: src/nthash_hpc.rs, src/hpc.rs:44-147,
src/nthash_avx512_32.rs) into one pass with cross-block carry.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_seq2kminmers_tpu.constants import XCODE_PAD, encode_xcodes
from rust_seq2kminmers_tpu.oracle import HashMode, minimizers
from rust_seq2kminmers_tpu.ops.pipeline import PipelineSpec, kminmer_pipeline
from rust_seq2kminmers_tpu.ops.pallas.fused_scan import (
    fused_minimizer_scan,
    slots_for_density,
)
from rust_seq2kminmers_tpu.ops.u64 import to_py_u64
from rust_seq2kminmers_tpu.oracle import kminmers as oracle_kminmers


def _batch(rng, B, L, alphabet="AACCGGTTAAAA"):
    codes = np.full((B, L), XCODE_PAD, dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    seqs = []
    for b in range(B):
        n = int(rng.integers(L // 2, L - 1))
        s = "".join(rng.choice(list(alphabet), size=n))
        seqs.append(s)
        codes[b, :n] = encode_xcodes(s, "scalar")
        lengths[b] = n
    return codes, lengths, seqs


def _run_scan(codes, lengths, spec, block_rows=8):
    B, L = codes.shape
    l = spec.l
    if spec.is_hpc:
        eff = np.zeros(B, dtype=np.int64)
        for b in range(B):
            c = codes[b, : lengths[b]]
            k = (c & 8) != 0  # precomputed raw-byte-diff keep bits
            if len(k):
                k[0] = True
            eff[b] = k.sum()
    else:
        eff = lengths.astype(np.int64)
    limit = eff - l - (1 if spec.mode == "hpc" else 0)
    limit = np.where(lengths > l, limit, -1).astype(np.int32)
    nslots = slots_for_density(spec.density)
    st, en, hs, cnts = fused_minimizer_scan(
        jnp.asarray(codes),
        jnp.asarray(lengths),
        jnp.asarray(limit),
        spec.l,
        spec.bound,
        spec.strict_threshold,
        spec.is_hpc,
        spec.mode == "hpc",
        nslots=nslots,
        block_rows=block_rows,
        interpret=True,
    )
    st, en, hs, cnts = map(np.asarray, (st, en, hs, cnts))
    # counts[b, t] = (kept, raw): nothing may be dropped in these tests
    np.testing.assert_array_equal(cnts[..., 0], cnts[..., 1])
    NT = cnts.shape[1]
    RO = st.shape[1] // NT
    streams = []
    for b in range(B):
        got = []
        for t in range(NT):
            n = int(cnts[b, t, 0])
            blk = slice(t * RO, (t + 1) * RO)
            s_ = st[b, blk].reshape(-1)[:n]
            e_ = en[b, blk].reshape(-1)[:n]
            h_ = hs[b, blk].reshape(-1)[:n]
            got.extend(
                (int(s_[q]), int(e_[q]), int(np.uint32(h_[q])))
                for q in range(n)
            )
        streams.append(got)
    return streams


@pytest.mark.parametrize("mode", ["regular", "simd", "hpc", "hpcsimd"])
@pytest.mark.parametrize("l", [5, 31])
def test_fused_scan_matches_oracle(rng, mode, l):
    d = 0.05
    codes, lengths, seqs = _batch(rng, B=3, L=2048)
    spec = PipelineSpec(l=l, k=2, density=d, mode=mode)
    streams = _run_scan(codes, lengths, spec)
    for b, got in enumerate(streams):
        ref = minimizers(seqs[b], l, d, HashMode(mode))
        assert got == ref, f"mode={mode} l={l} row {b}"


def test_fused_scan_run_spanning_blocks(rng):
    """A homopolymer run crossing the block boundary must stay one run."""
    l, d = 5, 0.2
    L = 4096
    block = 8 * 128  # block_rows=8
    s = "".join(rng.choice(list("ACGT"), size=L - 300))
    # plant a long run straddling the first block boundary
    s = s[: block - 50] + "A" * 120 + s[block + 70 :]
    codes = encode_xcodes(s, "scalar")[None, :]
    pad = np.full((1, L), XCODE_PAD, dtype=np.uint8)
    pad[0, : codes.shape[1]] = codes
    lengths = np.array([codes.shape[1]], dtype=np.int32)
    for mode in ["hpc", "hpcsimd"]:
        spec = PipelineSpec(l=l, k=2, density=d, mode=mode)
        got = _run_scan(pad, lengths, spec)[0]
        ref = minimizers(s, l, d, HashMode(mode))
        assert got == ref, mode


@pytest.mark.parametrize("l", [129, 255])
@pytest.mark.parametrize("mode", ["hpc", "hpcsimd"])
def test_fused_scan_large_l_two_row_carry(rng, mode, l):
    """l in [128, 255] exercises the TWO-row cross-block carry (the
    reference scalar HPC ring buffer is 256 chars, src/nthash_hpc.rs:9-11).
    Runs spanning many blocks with l wider than one 128-lane row."""
    codes, lengths, seqs = _batch(rng, B=2, L=4096, alphabet="AACCGGTT")
    spec = PipelineSpec(l=l, k=2, density=0.2, mode=mode)
    streams = _run_scan(codes, lengths, spec)
    for b, s in enumerate(seqs):
        ref = minimizers(s, l, 0.2, HashMode(mode))
        assert streams[b] == ref, (mode, l, b)


@pytest.mark.parametrize(
    "L,mode",
    [
        (5120, "hpc"),      # br=40  -> 5120 elems: single-payload branch
        (5120, "hpcsimd"),
        (20480, "hpcsimd"),  # br=160 -> half 10240: two-half packed branch
    ],
)
def test_fused_scan_non_pow2_block(rng, L, mode):
    """Non-power-of-two block element counts (e.g. multihost pads to
    multiples of 1024, io/stream buckets after occupancy clamping) must
    extract the full 14-bit pos field — a br*LANES-1 mask silently
    corrupts survivor positions whenever br*LANES is not a power of two."""
    l, d = 11, 0.05
    n = L - 17  # length not aligned to anything
    s = "".join(rng.choice(list("AACCGGTTA"), size=n))
    codes = np.full((1, L), XCODE_PAD, dtype=np.uint8)
    codes[0, :n] = encode_xcodes(s, "scalar")
    lengths = np.array([n], dtype=np.int32)
    spec = PipelineSpec(l=l, k=2, density=d, mode=mode)
    # block_rows=256 clamps to ceil(L/128) -> a non-pow2 block element count
    got = _run_scan(codes, lengths, spec, block_rows=256)[0]
    ref = minimizers(s, l, d, HashMode(mode))
    assert got == ref


def test_fused_scan_short_and_gated_reads(rng):
    """Reads with len <= l yield nothing (src/lib.rs:97 strict gate)."""
    l = 31
    L = 1024
    codes = np.full((3, L), XCODE_PAD, dtype=np.uint8)
    lengths = np.array([l, l - 5, l + 1], dtype=np.int32)
    for b in range(3):
        codes[b, : lengths[b]] = encode_xcodes(
            "".join(rng.choice(list("ACGT"), size=int(lengths[b]))),
            "scalar",
        )
    spec = PipelineSpec(l=l, k=2, density=1.0, mode="regular")
    streams = _run_scan(codes, lengths, spec)
    assert streams[0] == [] and streams[1] == []
    # len = l+1 admits exactly two windows at density 1.0 (starts 0 and 1)
    assert len(streams[2]) == 2


@pytest.mark.parametrize("mode", ["regular", "simd", "hpc", "hpcsimd"])
def test_fused_pipeline_end_to_end(rng, mode):
    """Full kminmer_pipeline through the fused path (compaction =
    fused_interpret) against the oracle, record-for-record."""
    codes, lengths, seqs = _batch(rng, B=2, L=4096, alphabet="AACCGGTTAANN")
    spec = PipelineSpec(
        l=7,
        k=3,
        density=0.02,
        mode=mode,
        max_minimizers=256,
        compaction="fused_interpret",
    )
    out = jax.jit(lambda c, n: kminmer_pipeline(c, n, spec))(
        jnp.asarray(codes), jnp.asarray(lengths)
    )
    for b in range(2):
        nk = int(out.n_kminmers[b])
        h = to_py_u64(
            (np.asarray(out.hash_hi[b, :nk]), np.asarray(out.hash_lo[b, :nk]))
        )
        ref = oracle_kminmers(seqs[b], 7, 3, 0.02, HashMode(mode))
        assert nk == len(ref)
        for i, r in enumerate(ref):
            assert (
                int(h[i]),
                int(out.start[b, i]),
                int(out.end[b, i]),
                bool(out.rev[b, i]),
            ) == (r.hash, r.start, r.end, r.rev)


@pytest.mark.parametrize("mode", ["regular", "hpc"])
def test_fused_pipeline_u64_lanes(rng, mode):
    """hash_width=64 through the fused kernel (64-bit hash lanes emulated
    as hi/lo int32 pairs in-kernel — the reference's H=u64 compile-time
    alternative, src/lib.rs:32) against the oracle, record-for-record.
    SIMD modes are excluded by PipelineSpec (u64 is a scalar-path config)."""
    codes, lengths, seqs = _batch(rng, B=2, L=4096, alphabet="AACCGGTTAANN")
    spec = PipelineSpec(
        l=9,
        k=3,
        density=0.02,
        mode=mode,
        hash_width=64,
        max_minimizers=256,
        compaction="fused_interpret",
    )
    out = jax.jit(lambda c, n: kminmer_pipeline(c, n, spec))(
        jnp.asarray(codes), jnp.asarray(lengths)
    )
    for b in range(2):
        nm = int(out.n_minimizers[b])
        mh = to_py_u64(
            (
                np.asarray(out.min_hash_hi[b, :nm]),
                np.asarray(out.min_hash[b, :nm]),
            )
        )
        ref_min = minimizers(seqs[b], 9, 0.02, HashMode(mode), hash_width=64)
        assert nm == len(ref_min), (mode, b)
        assert [int(x) for x in mh] == [h for (_, _, h) in ref_min]
        assert list(np.asarray(out.min_start[b, :nm])) == [
            s for (s, _, _) in ref_min
        ]
        nk = int(out.n_kminmers[b])
        h = to_py_u64(
            (np.asarray(out.hash_hi[b, :nk]), np.asarray(out.hash_lo[b, :nk]))
        )
        ref = oracle_kminmers(
            seqs[b], 9, 3, 0.02, HashMode(mode), hash_width=64
        )
        assert nk == len(ref)
        for i, r in enumerate(ref):
            assert (
                int(h[i]),
                int(out.start[b, i]),
                int(out.end[b, i]),
                bool(out.rev[b, i]),
            ) == (r.hash, r.start, r.end, r.rev), (mode, b, i)


@pytest.mark.parametrize("mode", ["regular", "hpc"])
def test_fused_pipeline_u16_lanes(rng, mode):
    """hash_width=16 through the fused kernel (16-bit rotates on low-half
    lanes; murmur MixHash at assembly — the reference's H=u16 config,
    src/lib.rs:30,142-155) against the oracle."""
    codes, lengths, seqs = _batch(rng, B=2, L=4096, alphabet="AACCGGTTAANN")
    spec = PipelineSpec(
        l=9,
        k=3,
        density=0.02,
        mode=mode,
        hash_width=16,
        max_minimizers=512,
        compaction="fused_interpret",
    )
    out = jax.jit(lambda c, n: kminmer_pipeline(c, n, spec))(
        jnp.asarray(codes), jnp.asarray(lengths)
    )
    for b in range(2):
        nm = int(out.n_minimizers[b])
        ref_min = minimizers(seqs[b], 9, 0.02, HashMode(mode), hash_width=16)
        assert nm == len(ref_min), (mode, b)
        assert [int(x) for x in np.asarray(out.min_hash[b, :nm])] == [
            h for (_, _, h) in ref_min
        ]
        nk = int(out.n_kminmers[b])
        h = to_py_u64(
            (np.asarray(out.hash_hi[b, :nk]), np.asarray(out.hash_lo[b, :nk]))
        )
        ref = oracle_kminmers(
            seqs[b], 9, 3, 0.02, HashMode(mode), hash_width=16
        )
        assert nk == len(ref)
        for i, r in enumerate(ref):
            assert (
                int(h[i]),
                int(out.start[b, i]),
                int(out.end[b, i]),
                bool(out.rev[b, i]),
            ) == (r.hash, r.start, r.end, r.rev), (mode, b, i)
