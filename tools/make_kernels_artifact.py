"""Regenerate the kernel roofline artifact (KERNELS_r{N}.json) on-chip.

One relay session: slope-timed kernels + DCE-proof primitive calibration
(round-4: full-reduction chains + the f32-operand MXU rate) + the batched
pipeline/decode suites.  Usage:

    python tools/make_kernels_artifact.py KERNELS_r04.json [size_mb] [kind]
"""

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "KERNELS_r04.json"
    size_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    kind = sys.argv[3] if len(sys.argv) > 3 else "text"

    from datacomp_tpu.benchmark.kernels import (
        run_decode_batch_bench,
        run_kernel_bench,
        run_pipeline_batch_bench,
    )

    k = run_kernel_bench(size_mb=size_mb, kind=kind)
    print(json.dumps(k, indent=1), flush=True)
    p = run_pipeline_batch_bench(size_mb=size_mb, kind=kind)
    print(json.dumps(p, indent=1), flush=True)
    d = run_decode_batch_bench(size_mb=size_mb, kind=kind)
    print(json.dumps(d, indent=1), flush=True)
    artifact = {
        "chunk_mb": size_mb,
        "kind": kind,
        "kernels": k,
        "pipeline_batched": p,
        "decode_batched": d,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
