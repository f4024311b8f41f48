"""MXU one-hot permutation prototype for the HPC in-row compaction stage
(VERDICT r4 #4): stress-test PROF_r04's lower-bound claim that the move
network's log2(D) predicated-uniform-shift rounds are a floor, by
implementing the alternative the bound ignored — realizing the in-row
(<= 128-lane) part of the data-dependent compaction as a per-row one-hot
permutation MATMUL on the MXU — and racing the two on identical work.

Task (both kernels, bit-validated against numpy): given payload x[R, 128]
(u32 carried as two 16-bit halves in f32 — exact, values < 2^16 < 2^24)
and keep mask k[R, 128], left-pack each row's kept payloads.

  * roll kernel: 7 rounds of uniform `pltpu.roll` + select driven by the
    per-element rank deficit's bits, LSB first (deficits are monotone
    within a row, so bitwise shifting is stable) — the in-row slice of
    the production network (ops/pallas/fused_scan.py).
  * onehot kernel: per row, P[j, i] = [rank(j) == i AND keep(j)], then
    out[i] = sum_j x[j] * P[j, i] — an O(1)-round arbitrary permutation,
    computed as 8 batched [1x128]x[128x128] dots per 8-row group.

Writes the measured ms/step for both into stdout (PROF_r05.md records
the numbers + the extended floor argument).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 512, 128
STEPS = 64
F32 = jnp.float32
I32 = jnp.int32


def _rank_excl(kf):
    """Exclusive in-row rank via the MXU triangular-matmul prefix sum
    (the production kernel's trick, fused_scan.py; cumsum has no Mosaic
    lowering): rank[_, i] = sum_{j < i} kf[_, j] = kf @ STRICT_LOWER^T."""
    j2 = jax.lax.broadcasted_iota(I32, (L, L), dimension=0).astype(F32)
    i2 = jax.lax.broadcasted_iota(I32, (L, L), dimension=1).astype(F32)
    tri = jnp.where(j2 < i2, 1.0, 0.0)  # [src j, dst i], strict
    return jax.lax.dot_general(
        kf, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _deficit(kf):
    """Rank deficit d[j] = j - rank(j) for kept elements (monotone
    non-decreasing along the row); f32 matmul prefix sums exact < 2^24."""
    j = jax.lax.broadcasted_iota(I32, kf.shape, dimension=1).astype(F32)
    return j - _rank_excl(kf)


def roll_kernel(*refs, npay: int):
    xs = [r[0] for r in refs[:npay]]
    kf = refs[npay][0]
    outs = refs[npay + 1 :]
    d = _deficit(kf).astype(I32)
    keep = kf != 0
    # Destination-oriented LSB-first shift network: at round b, slot i
    # takes the element 2^b to its right iff that element still owes a
    # move with bit b set.  Monotone deficits make this stable.
    r = jnp.where(keep, d, jnp.int32(L))  # dropped elements never land
    for b in range(7):
        s = 1 << b
        cand_xs = [pltpu.roll(x, L - s, 1) for x in xs]
        cand_r = pltpu.roll(r, L - s, 1)
        li = jax.lax.broadcasted_iota(I32, kf.shape, dimension=1)
        valid_src = li < L - s  # no wraparound into the row
        take = valid_src & (cand_r < L) & (((cand_r >> b) & 1) != 0)
        # a slot whose own element moves away becomes free implicitly:
        # its element was copied left in this same round
        xs = [jnp.where(take, cx, x) for cx, x in zip(cand_xs, xs)]
        moved_away = (r < L) & (((r >> b) & 1) != 0)
        r = jnp.where(
            take, cand_r - s, jnp.where(moved_away, jnp.int32(L), r)
        )
    for o, x in zip(outs, xs):
        o[0] = jnp.where(r == 0, x, 0.0)


def onehot_kernel(*refs, npay: int):
    xs = [r[0] for r in refs[:npay]]  # each [8, 128]
    kf = refs[npay][0]
    outs = refs[npay + 1 :]
    rank = _rank_excl(kf)
    # one-hot routing matrix per row, built ONCE for every payload:
    # [8, 128(src j), 128(dst i)]
    i3 = jax.lax.broadcasted_iota(I32, (8, L, L), dimension=2).astype(F32)
    oh = jnp.where(
        (rank[:, :, None] == i3) & (kf[:, :, None] != 0), 1.0, 0.0
    )
    # HIGHEST precision: the default TPU dot rounds f32 operands through
    # bf16 (8-bit mantissa), corrupting 16-bit payload halves — measured
    # on-chip.  This is part of the honest cost of MXU routing: exact
    # payload movement needs the multi-pass f32-emulation matmul.
    for o, x in zip(outs, xs):
        o[0] = jax.lax.dot_general(
            x[:, None, :], oh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=F32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :]


def run_roll(xs, k, interpret):
    npay = len(xs)
    outs = pl.pallas_call(
        functools.partial(roll_kernel, npay=npay),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * (npay + 1),
        out_specs=[pl.BlockSpec((1, R, L), lambda b: (0, 0, 0),
                                memory_space=pltpu.VMEM)] * npay,
        out_shape=[jax.ShapeDtypeStruct((1, R, L), F32)] * npay,
        interpret=interpret,
    )(*[x[None] for x in xs], k[None])
    return [o[0] for o in outs]


def run_onehot(xs, k, interpret):
    npay = len(xs)
    G = R // 8
    outs = pl.pallas_call(
        functools.partial(onehot_kernel, npay=npay),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, 8, L), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)] * (npay + 1),
        out_specs=[pl.BlockSpec((1, 8, L), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * npay,
        out_shape=[jax.ShapeDtypeStruct((G, 8, L), F32)] * npay,
        interpret=interpret,
    )(*[x.reshape(G, 8, L) for x in xs], k.reshape(G, 8, L))
    return [o.reshape(R, L) for o in outs]


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(3)
    kh = (rng.random((R, L)) < 0.75).astype(np.float32)
    k = jnp.asarray(kh)
    for npay in (1, 4):
        xhs = [
            rng.integers(0, 1 << 16, size=(R, L)).astype(np.float32)
            for _ in range(npay)
        ]
        refs = []
        for xh in xhs:
            ref = np.zeros((R, L), np.float32)
            for r in range(R):
                sel = xh[r][kh[r] != 0]
                ref[r, : len(sel)] = sel
            refs.append(ref)
        xs = [jnp.asarray(x) for x in xhs]
        for name, fn in (("roll", run_roll), ("onehot", run_onehot)):
            outs = jax.jit(functools.partial(fn, interpret=interpret))(
                xs, k
            )
            for o, ref in zip(outs, refs):
                assert np.array_equal(np.asarray(o), ref), (
                    f"{name} kernel mismatch (npay={npay})"
                )
        print(
            f"both kernels exact on [{R}, {L}] @ 75% keep, "
            f"{npay} payload(s)", flush=True,
        )
        if interpret:
            continue

        for name, fn in (("roll", run_roll), ("onehot", run_onehot)):
            pfn = functools.partial(fn, interpret=False)

            @jax.jit
            def unit(xs, k):
                def body(acc, i):
                    outs = pfn(
                        [jnp.roll(x, i, axis=1) for x in xs], k
                    )
                    return acc + sum(o[0, 0] + o[-1, -1] for o in outs), None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0), jnp.arange(STEPS, dtype=I32)
                )
                return acc

            float(unit(xs, k))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jax.block_until_ready(unit(xs, k)))
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) / STEPS * 1e3
            print(
                f"{name:7s}: {ms:8.4f} ms/step  "
                f"[{R}x{L} tile, {npay} payload(s)]", flush=True,
            )
    if interpret:
        print("interpret mode — skipping timing")


if __name__ == "__main__":
    main()
