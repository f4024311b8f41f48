"""Multi-batch end-to-end file -> k-min-mers streaming benchmark on the
real chip: generates a mixed-length FASTA (two length buckets, several
batches per bucket), runs stream_file cold and warm, and decomposes the
wall into the runner's own stats (pack overlap, background program
warm-up, first-result latency).

This is the surface BENCH_STARTUP does NOT cover: multiple batches per
bucket, where the double-buffered dispatch window, the producer-thread
nibble-packing and the warm thread's overlap actually engage.  Through
the axon tunnel the steady state is H2D-bound (MB/s-class link); the
LONGREAD_r05 decomposition attributes that, and the packed transfer
halves it.

Writes STREAM_E2E_r05.json.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import os

    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rust_seq2kminmers_tpu.io.stream import StreamingRunner
    from rust_seq2kminmers_tpu.ops.pipeline import PipelineSpec

    rng = np.random.default_rng(21)
    tmp = tempfile.mkdtemp()
    fa = f"{tmp}/reads.fa"
    total = 0
    with open(fa, "w") as fh:
        # 96 x ~1 Mb + 64 x ~250 kb: two buckets, multiple batches each
        for i in range(96):
            n = int(rng.integers(900_000, 1_000_000))
            s = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
            fh.write(f">long{i}\n")
            fh.write(s.tobytes().decode("latin-1"))
            fh.write("\n")
            total += n
        for i in range(64):
            n = int(rng.integers(200_000, 250_000))
            s = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
            fh.write(f">short{i}\n")
            fh.write(s.tobytes().decode("latin-1"))
            fh.write("\n")
            total += n
    print(f"file: {total / 1e6:.0f} Mbp in 160 records", flush=True)

    spec = PipelineSpec(l=31, k=5, density=0.01, mode="hpcsimd")
    runs = []
    for label in ("cold", "warm", "warm2"):
        with StreamingRunner(fa, spec, keep_records=False) as r:
            st = r.run()
        runs.append({
            "label": label,
            "wall_s": round(st.wall_s, 2),
            "gb_s_end_to_end": round(total / st.wall_s / 1e9, 4),
            "pack_s_overlapped": round(st.pack_s, 2),
            "program_warm_s_overlapped": round(st.warm_s, 2),
            "first_result_s": round(st.first_result_s, 2),
            "batches": st.batches,
            "buckets": st.buckets,
            "kminmers": st.total_kminmers,
        })
        print(runs[-1], flush=True)
    assert runs[0]["kminmers"] == runs[1]["kminmers"] == runs[2]["kminmers"]

    out = {
        "total_bases": total,
        "records": 160,
        "spec": "hpcsimd l=31 k=5 d=0.01",
        "runs": runs,
        "note": (
            "end-to-end wall through the axon tunnel is H2D-bound "
            "(nibble-packed batches, ~0.5 B/base on the wire); compute "
            "per 32 MB batch is ~5 ms (BENCH_MODES_r05) vs ~payload/"
            "link-rate of transfer, all overlapped by the producer/"
            "double-buffer pipeline. pack_s and program_warm_s run on "
            "background threads (overlapped, not additive); "
            "first_result_s shows how long the first settled batch "
            "takes — the warm thread's program load no longer gates it "
            "on warm runs."
        ),
    }
    (REPO / "STREAM_E2E_r05.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print("wrote STREAM_E2E_r05.json")


if __name__ == "__main__":
    main()
