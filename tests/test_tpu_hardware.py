"""Hardware-gated TPU tests — the translation of the reference's
``@Tag("gpu")`` + ``@EnabledIfSystemProperty`` tier
(``GpuFrequencyServiceTest.java:13,39``): auto-skipped everywhere, enabled
with ``DATACOMP_TPU_TESTS=1 pytest -m tpu tests/test_tpu_hardware.py``.

The rest of the suite pins JAX to a virtual CPU mesh at conftest import, so
these tests drive the real chip from a clean subprocess.  They are also
excluded from default runs because a first program load through a
remote-attached TPU can take minutes.
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("DATACOMP_TPU_TESTS") != "1",
        reason="set DATACOMP_TPU_TESTS=1 to run against real TPU hardware",
    ),
]

HW_SCRIPT = r"""
import numpy as np
import jax

devs = jax.devices()
assert any(d.platform.lower() in ("tpu", "axon") for d in devs), f"no TPU: {devs}"

# 1. device histogram correctness on chip
from datacomp_tpu.ops import histogram_device
import jax.numpy as jnp
rng = np.random.default_rng(7)
data = rng.integers(0, 256, 1 << 16).astype(np.uint8)
h = np.asarray(histogram_device(jnp.asarray(data), jnp.int32(data.size)))
assert np.array_equal(h, np.bincount(data, minlength=256)), "histogram mismatch"
print("HW-HISTOGRAM-OK", flush=True)

# 2. encode + decode round trip entirely on chip
from datacomp_tpu.core.huffman import build_codebook
from datacomp_tpu.ops import (
    DEFAULT_REFILL_WORDS, build_decode_tables, decode_device,
    encode_device_merge, max_code_len, payload_to_words, syms_per_refill,
    words_to_bytes,
)
sb = 96
n = sb * 32
data = (rng.integers(0, 9, n) ** 2).astype(np.uint8)
lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
maxlen = max_code_len(lens)
ow = (9 * n + 31) // 32 + 2
words, total_bits, gaps = encode_device_merge(
    jnp.asarray(data), jnp.int32(n), jnp.asarray(lens.astype(np.int32)),
    jnp.asarray(codes.astype(np.uint32)), ow, subblock=sb,
    max_slots=min(33, maxlen + 2),
)
payload = words_to_bytes(np.asarray(words), int(total_bits))
limits, adj, sym = build_decode_tables(lens)
nsub = n // sb
out = decode_device(
    jnp.asarray(payload_to_words(payload)), jnp.asarray(np.asarray(gaps)[:nsub]),
    jnp.asarray(limits), jnp.asarray(adj), jnp.asarray(sym),
    sb, nsub,
    syms_per_step=syms_per_refill(maxlen, sb, DEFAULT_REFILL_WORDS),
    refill_words=DEFAULT_REFILL_WORDS,
)
assert np.array_equal(np.asarray(out)[:n], data), "on-chip round trip mismatch"
print("HW-ROUNDTRIP-OK", flush=True)
"""


def _run_hw_script(tmp_path, script_text: str, *expect: str, timeout: int = 1800):
    """Run a chip-driving script in a clean subprocess (the suite's conftest
    pins this process to a virtual CPU mesh).  One subprocess at a time —
    the relay serializes first program loads badly under concurrency."""
    script = tmp_path / "hw.py"
    script.write_text(script_text)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True,
        text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f"hardware test failed:\n{proc.stderr[-3000:]}"
    for marker in expect:
        assert marker in proc.stdout, f"missing {marker}:\n{proc.stdout[-2000:]}"


def test_device_ops_on_real_tpu(tmp_path):
    _run_hw_script(tmp_path, HW_SCRIPT, "HW-HISTOGRAM-OK", "HW-ROUNDTRIP-OK")


PALLAS_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

devs = jax.devices()
assert any(d.platform.lower() in ("tpu", "axon") for d in devs), f"no TPU: {devs}"

# The production Mosaic kernel (NOT the interpreter): packed-8 stacked-f32
# one-hot histogram, exact vs np.bincount, including the valid_len mask.
from datacomp_tpu.ops import histogram_pallas, pallas_available
assert pallas_available(), "Mosaic unavailable on the hardware tier"
rng = np.random.default_rng(11)
n = 1 << 20
data = rng.integers(0, 256, n).astype(np.uint8)
for valid in (n, n - 12345):
    h = np.asarray(histogram_pallas(jnp.asarray(data), jnp.int32(valid)))
    ref = np.bincount(data[:valid], minlength=256)
    assert np.array_equal(h, ref), f"pallas histogram mismatch at valid={valid}"
print("HW-PALLAS-OK", flush=True)
"""


def test_pallas_histogram_on_real_tpu(tmp_path):
    """The Pallas production kernel on the real chip (the CPU suite can only
    cover it via the interpreter at tiny sizes) — the reference's GPU kernel
    test tier actually exercising its production path
    (``GpuFrequencyServiceTest.java:39-60``)."""
    _run_hw_script(tmp_path, PALLAS_SCRIPT, "HW-PALLAS-OK")


SERVICE_SCRIPT_TMPL = r"""
import os
import numpy as np
import jax

devs = jax.devices()
assert any(d.platform.lower() in ("tpu", "axon") for d in devs), f"no TPU: {devs}"

import tempfile
from datacomp_tpu.config import load_config
from datacomp_tpu.services.tpu_service import TpuCompressionService
from datacomp_tpu.utils.testdata import generate_bytes

cfg = load_config(
    compression={
        "chunk_size_mb": 1, "format_version": 2, "codebook_mode": "device",
    },
    device={"batch_chunks": %(batch)d},
)
blob = (
    generate_bytes("text", 1 << 20)
    + generate_bytes("skewed", 1 << 20)
    + generate_bytes("random", 1 << 20)      # raw-store routing
    + generate_bytes("compressible", (1 << 20) + 4321)  # ragged tail
)
with tempfile.TemporaryDirectory() as d:
    src, dcz, out = d + "/in.bin", d + "/a.dcz", d + "/out.bin"
    with open(src, "wb") as f:
        f.write(blob)
    svc = TpuCompressionService(cfg)
    assert svc.is_available(), "TPU service unavailable"
    svc.compress(src, dcz)
    assert svc.verify_integrity(dcz, deep=True), "verify failed"
    svc.decompress(dcz, out)
    with open(out, "rb") as f:
        assert f.read() == blob, "service round trip mismatch"
    svc.close()
print("HW-SERVICE-B%(batch)d-OK", flush=True)
"""


def test_full_service_round_trip_on_real_tpu(tmp_path):
    """Full TpuCompressionService compress → verify → decompress → byte-equal
    on the chip, per-chunk dispatch (the production default on this relay)
    — the translation of the reference's end-to-end GPU integration test
    (``Phase3IntegrationTest.java:33-93``)."""
    _run_hw_script(
        tmp_path, SERVICE_SCRIPT_TMPL % {"batch": 1}, "HW-SERVICE-B1-OK"
    )


def test_batched_service_round_trip_on_real_tpu(tmp_path):
    """Same round trip with ``device.batch_chunks = 4``: drives the batched
    encode executable (``TpuChunkCodec._batched_pipeline``) and the grouped
    batched decode (``decode_chunk_batch``) on the chip."""
    _run_hw_script(
        tmp_path, SERVICE_SCRIPT_TMPL % {"batch": 4}, "HW-SERVICE-B4-OK"
    )
