"""Real-chip validation of the chunked long-read driver at >= 300 Mbp.

Runs ONE synthetic 300 Mbp read through ops/long_read.py on the TPU
(lifting the single-launch padded-length cap via the kernel carry), and
validates five ways:
  1. chunk-size invariance of the full minimizer stream (64M vs 128M
     chunks exercise different chunk-boundary placements over the same
     read);
  2. bit-exact oracle equality on a multi-chunk 4 Mbp slice (prefix, so
     stream prefixes coincide);
  3. host xcode-encode throughput (native AVX-512 path, ndarray input);
  4. device-resident throughput of the steady-state chunk loop (GB/s) at
     the production block geometry (block_rows=512 for hpc modes, like
     the batch pipeline);
  5. batched long reads (kminmers_long_batch): 2 x half-size reads riding
     the same launches must equal their per-read runs record-for-record.

r5 adds the explicit end-to-end decomposition (encode / upload / compute
/ download measured separately) so the tunnel-bound share is attributed,
not blended, and the phase-A producer-thread pipeline overlaps staging +
uploads with dispatch (warm end-to-end ~ max(upload, compute) + fetch).

Writes LONGREAD_r05.json at the repo root.

Usage: python scripts/long_read_300m.py [n_mbp]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rust_seq2kminmers_tpu.constants import encode_xcodes  # noqa: E402
from rust_seq2kminmers_tpu.ops.long_read import (  # noqa: E402
    minimizer_stream_long,
)
from rust_seq2kminmers_tpu.ops.pipeline import PipelineSpec  # noqa: E402


def synth_read(n: int, seed: int = 42) -> np.ndarray:
    """Synthetic genome-ish bytes: random ACGT with interspersed short
    homopolymer runs (so HPC modes do real work).  Fully vectorized: draw
    per-run (base, length) pairs, repeat, truncate."""
    rng = np.random.default_rng(seed)
    # mean run length ~1.25: mostly singletons, ~2% runs of 2-12
    m = int(n * 0.9) + 16
    lens = np.where(
        rng.random(m) < 0.02, rng.integers(2, 13, size=m), 1
    )
    bases = rng.integers(0, 4, size=m).astype(np.uint8)
    b = np.repeat(bases, lens)[:n]
    if b.shape[0] < n:  # pragma: no cover — margin above makes this rare
        b = np.concatenate([b, rng.integers(0, 4, size=n - b.shape[0]).astype(np.uint8)])
    return np.frombuffer(b"ACGT", dtype=np.uint8)[b]


def main():
    import faulthandler

    faulthandler.dump_traceback_later(1200, repeat=True, exit=False)
    n_mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n = n_mbp * 1_000_000
    mode, l, k, d = "hpcsimd", 31, 5, 0.01
    spec = PipelineSpec(l=l, k=k, density=d, mode=mode)
    import os

    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"generating {n_mbp} Mbp synthetic read ...", flush=True)
    raw = synth_read(n)
    t_enc = None
    for _ in range(3):  # warm: the first call compiles/loads the C ext
        t0 = time.perf_counter()
        codes = encode_xcodes(raw, "simd")
        dt = time.perf_counter() - t0
        t_enc = dt if t_enc is None else min(t_enc, dt)
    print(f"host encode: {n / t_enc / 1e9:.2f} GB/s", flush=True)

    # Device-resident streaming rate: the chunk step (fused scan + carry +
    # phase-2 compaction) under lax.scan, one sync per 8 chunks — the rate
    # the hardware sustains when the host/tunnel is out of the picture
    # (the axon tunnel adds ~0.3-0.4 s latency PER LAUNCH; a co-located
    # host would pay ~100 us).  Uses the production block geometry
    # (block_rows=512 for hpc modes — ops/pipeline.py picks the same).
    import jax.numpy as jnp

    from rust_seq2kminmers_tpu.ops.long_read import _chunk_step, _nslots
    from rust_seq2kminmers_tpu.ops.pipeline import default_rows_out

    cdev = 1 << 25
    br = 512
    m_dev = spec.capacity_for(cdev)
    stepd = _chunk_step(
        spec, cdev, _nslots(spec), default_rows_out(d, br), m_dev, False,
        block_rows=br, counts_cap=32,
    )
    buf = jnp.asarray(codes[None, :cdev])
    I32 = jnp.int32
    ll = jnp.full((1,), cdev, I32)
    lim = jnp.full((1,), 1 << 30, I32)
    STEPS = 64  # >= 64 steps/sync amortizes the tunnel's ~28 ms fixed
    # per-sync cost below 0.5 ms/step (PROF_r03 methodology)

    @jax.jit
    def unit(buf):
        def body(carry, i):
            acc, b0, p0, cacc = carry
            mst, men, mhs, b1, p1, cacc = stepd(
                jnp.roll(buf, i, axis=1), ll, lim, b0, p0, cacc, i
            )
            nm = cacc[jnp.minimum(i, 31), 0, 0]
            return (acc + nm + mst[0, 0], b1, p1, cacc), None

        init = (
            jnp.int32(0),
            jnp.zeros((1,), I32),
            jnp.zeros((1, 8, 128), I32),
            jnp.zeros((32, 1, 2), I32),
        )
        (acc, _, _, _), _ = jax.lax.scan(
            body, init, jnp.arange(STEPS, dtype=jnp.int32)
        )
        return acc

    int(unit(buf))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(unit(buf))
        ts.append(time.perf_counter() - t0)
    dev_gbs = cdev / (float(np.median(ts)) / STEPS) / 1e9
    print(f"device-resident chunk stream: {dev_gbs:.2f} GB/s", flush=True)

    # ---- decomposition: upload and download measured in isolation so the
    # end-to-end wall's tunnel-bound share is attributed, not blended.
    nchunks = -(-n // cdev)
    from rust_seq2kminmers_tpu.ops.long_read import _pack_nibbles

    # production phase A packs two 4-bit xcodes per byte before upload.
    # Each rep syncs by materializing a REDUCTION of the uploaded array to
    # host: block_until_ready is not a trustworthy wire-completion barrier
    # through the tunnel (memory: axon measurement rules), but a computed
    # result cannot exist before its operand finished arriving.  (Sanity:
    # the measured time halves exactly with the packed payload size.)
    up_buf = _pack_nibbles(np.ascontiguousarray(codes[:cdev][None, :]))
    up_sum = jax.jit(lambda x: jnp.max(x))
    int(up_sum(jax.device_put(up_buf)))  # warm path
    t0 = time.perf_counter()
    for _ in range(nchunks):
        int(up_sum(jax.device_put(up_buf)))
    t_upload = time.perf_counter() - t0
    print(f"upload ({nchunks} x {up_buf.nbytes >> 20} MB nibble-packed "
          f"chunks): {t_upload:.2f}s = {n / t_upload / 1e9:.3f} GB/s "
          "(sequence GB/s over packed bytes)", flush=True)
    # download: one phase-D-sized survivor fetch per chunk.  The buffer
    # must be random (the tunnel compresses constant data) AND produced
    # ON DEVICE (device_get of an uploaded array returns the cached host
    # copy without touching the tunnel), and each rep must re-materialize
    # it (the first fetch populates the array's host cache).
    rngd = np.random.default_rng(7)
    dl_src = jax.device_put(
        jnp.asarray(
            rngd.integers(0, 2**31, size=(3, 1, m_dev), dtype=np.int32)
        )
    )
    mk_dl = jax.jit(lambda x, s: x ^ s)
    np.asarray(jax.device_get(mk_dl(dl_src, jnp.int32(0))))  # warm
    t0 = time.perf_counter()
    for r in range(nchunks):
        np.asarray(jax.device_get(mk_dl(dl_src, jnp.int32(r + 1))))
    t_download = time.perf_counter() - t0
    print(f"download ({nchunks} x {3 * m_dev * 4 >> 20} MB): "
          f"{t_download:.2f}s", flush=True)
    # per-sync tunnel round trip (phase B pays exactly one)
    tiny = jax.jit(lambda x: x + 1)
    int(tiny(jnp.int32(0)))
    t0 = time.perf_counter()
    int(tiny(jnp.int32(1)))
    t_rtt = time.perf_counter() - t0
    t_compute = n / dev_gbs / 1e9
    decomp = {
        "encode_s": round(t_enc, 3),
        "upload_s": round(t_upload, 3),
        "compute_s": round(t_compute, 3),
        "download_s": round(t_download, 3),
        "sync_rtt_s": round(t_rtt, 3),
        "sum_s": round(t_enc + t_upload + t_compute + t_download, 3),
        "max_overlap_s": round(max(t_upload, t_compute) + t_download, 3),
    }

    results = {}
    streams = {}
    for chunk in (1 << 25, 1 << 26, 1 << 27):
        t0 = time.perf_counter()
        st, en, hs = minimizer_stream_long(codes, spec, chunk=chunk)
        dt = time.perf_counter() - t0
        # warm second pass for steady-state throughput (compile excluded)
        t0 = time.perf_counter()
        st, en, hs = minimizer_stream_long(codes, spec, chunk=chunk)
        dt_warm = time.perf_counter() - t0
        streams[chunk] = (st, en, hs)
        results[f"chunk_{chunk >> 20}M"] = {
            "n_minimizers": int(len(st)),
            "cold_s": round(dt, 3),
            "warm_s": round(dt_warm, 3),
            "warm_gb_s": round(n / dt_warm / 1e9, 3),
        }
        print(f"chunk={chunk >> 20}M: {len(st)} minimizers, "
              f"warm {n / dt_warm / 1e9:.2f} GB/s", flush=True)

    a, b = streams[1 << 25], streams[1 << 26]
    inv = (
        len(a[0]) == len(b[0])
        and all(
            np.array_equal(a[i], s[i])
            for s in streams.values()
            for i in range(3)
        )
    )
    print(f"chunk-size invariance: {'OK' if inv else 'MISMATCH'}")

    # multi-chunk oracle slice: the first 4 Mbp as an independent read —
    # its minimizer stream must be a prefix of the long read's (windows
    # near the slice end may differ/end early; compare strictly inside).
    from rust_seq2kminmers_tpu.oracle import HashMode, minimizers

    n_sl = 4_000_000
    sl = raw[:n_sl].tobytes().decode("latin-1")
    t0 = time.perf_counter()
    ref = minimizers(sl, l, d, HashMode(mode))
    print(f"oracle 4 Mbp: {time.perf_counter() - t0:.1f}s", flush=True)
    safe = [r for r in ref if r[1] < n_sl - 64]
    st, en, hs = a
    got = list(zip(st[: len(safe)].tolist(), en[: len(safe)].tolist(),
                   [int(x) for x in hs[: len(safe)]]))
    oracle_ok = got == safe
    print(f"oracle 4 Mbp prefix: {'OK' if oracle_ok else 'MISMATCH'} "
          f"({len(safe)} records)")

    # ---- batched long reads: two half-size reads through ONE set of
    # [2, chunk] launches must equal their per-read runs record-for-record
    # (kminmers_long_batch, VERDICT r4 #7).
    from rust_seq2kminmers_tpu.ops.long_read import (
        minimizer_stream_long_batch,
    )

    half = n // 2
    rows = [codes[:half], codes[half:]]
    got2 = minimizer_stream_long_batch(rows, spec, chunk=cdev)  # warm
    t0 = time.perf_counter()
    got2 = minimizer_stream_long_batch(rows, spec, chunk=cdev)
    t_batch = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref2 = [
        minimizer_stream_long(r, spec, chunk=cdev) for r in rows
    ]
    t_per = time.perf_counter() - t0
    batch_ok = all(
        np.array_equal(got2[b][i], ref2[b][i])
        for b in range(2)
        for i in range(3)
    )
    print(f"batched 2 x {half // 1_000_000} Mbp: "
          f"{'OK' if batch_ok else 'MISMATCH'} "
          f"(batch {t_batch:.1f}s vs per-read {t_per:.1f}s)", flush=True)

    out = {
        "read_mbp": n_mbp,
        "mode": mode,
        "l": l,
        "k": k,
        "density": d,
        "host_encode_gb_s": round(n / t_enc / 1e9, 3),
        "device_resident_gb_s": round(dev_gbs, 3),
        "device_resident_steps_per_sync": STEPS,
        "decomposition_32M_chunks": decomp,
        "chunk_invariance": bool(inv),
        "oracle_4mbp_prefix": bool(oracle_ok),
        "batched_2x_half_exact": bool(batch_ok),
        "batched_wall_s": round(t_batch, 3),
        "per_read_wall_s": round(t_per, 3),
        "note": "end-to-end rates include the axon tunnel's ~0.3-0.4 s "
        "PER-LAUNCH dispatch latency and MB/s-class transfers; the "
        "decomposition attributes the wall to encode/upload/compute/"
        "download measured in isolation — phase A's producer thread "
        "overlaps staging+upload with dispatch, so warm end-to-end ~ "
        "max(upload, compute) + download rather than their sum. "
        "device_resident_gb_s is the rate with host I/O out of the "
        "picture (co-located hosts pay ~100 us/launch over PCIe). The "
        "download probe fetches full-entropy arrays and so overstates "
        "phase D (real survivor buffers are ~1/4 valid + 3/4 zero "
        "padding, which the tunnel compresses); upload is "
        "nibble-packed (two 4-bit xcodes/byte, unpacked on-device).",
        **results,
    }
    path = Path(__file__).resolve().parents[1] / "LONGREAD_r05.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    if not (inv and oracle_ok and batch_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()
