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


def test_device_ops_on_real_tpu(tmp_path):
    script = tmp_path / "hw.py"
    script.write_text(HW_SCRIPT)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True,
        text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"hardware test failed:\n{proc.stderr[-3000:]}"
    assert "HW-HISTOGRAM-OK" in proc.stdout
    assert "HW-ROUNDTRIP-OK" in proc.stdout
