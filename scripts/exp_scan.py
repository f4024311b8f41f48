"""Config sweep of the fused scan kernel on the real chip (scratch)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from rust_seq2kminmers_tpu.ops.pallas.fused_scan import (
    fused_minimizer_scan,
    slots_for_density,
)
from rust_seq2kminmers_tpu.constants import with_keep_bits, hash_bound_u32

B, L = 32, 1 << 20
STEPS = 64  # r3 methodology fix: >= 64 steps/sync amortizes the tunnel's
# ~28 ms fixed per-sync cost below 0.5 ms/step


def scan_time(make_step, name):
    @jax.jit
    def unit():
        def body(acc, i):
            return acc + make_step(i), None

        acc, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32)
        )
        return acc

    int(unit())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(unit())
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / STEPS * 1e3
    gbps = B * L / (float(np.median(times)) / STEPS) / 1e9
    print(f"{name:44s} {ms:8.3f} ms/step   {gbps:7.2f} GB/s", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(with_keep_bits(rng.integers(0, 4, size=(B, L))))
    lengths = jnp.asarray(np.full(B, L, np.int32))
    limit = (lengths - 31).astype(jnp.int32)
    bound = int(hash_bound_u32(0.01))
    nslots = slots_for_density(0.01)

    def vary(i):
        return jnp.roll(codes, i, axis=1)

    def case(name, **kw):
        def step(i):
            st, en, hs, rc = fused_minimizer_scan(
                vary(i), lengths, limit, 31, bound,
                kw.pop("strict", True) if "strict" in kw else True,
                kw.pop("do_hpc"), kw.pop("hpc_end", False),
                nslots=nslots, **kw,
            )
            return rc.sum() + st[:, :, 0].sum()

        return scan_time(step, name)

    case("regular br=512 upack", do_hpc=False, emit_end=False, block_rows=512)
    case("regular br=1024 upack", do_hpc=False, emit_end=False, block_rows=1024)
    case("hpc br=512 4-part + end", do_hpc=True, emit_end=True, block_rows=512)
    case("hpc br=512 4-part no-end", do_hpc=True, emit_end=False, block_rows=512)
    case("hpc br=256 2-part + end", do_hpc=True, emit_end=True, block_rows=256)


if __name__ == "__main__":
    main()
