"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the full
sharded compress step (histogram → device codebook → encode → all_gather
offsets) and the driver dry-run entry."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from datacomp_tpu import native  # noqa: E402
from datacomp_tpu.ops import words_to_bytes  # noqa: E402
from datacomp_tpu.parallel import make_mesh, sharded_compress_arrays  # noqa: E402
from datacomp_tpu.utils.testdata import generate_bytes  # noqa: E402


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_sharded_step_end_to_end(mesh8):
    CH = 16384
    B = 16
    blob = generate_bytes("text", B * CH)
    batch = np.frombuffer(blob, np.uint8).reshape(B, CH).copy()
    valid = np.full(B, CH, np.int32)
    valid[-1] = 777  # ragged tail

    out = sharded_compress_arrays(mesh8, batch, valid, subblock=512)
    hists, lengths, codes, words, total_bits, gaps, comp_bytes, offsets = map(np.asarray, out)

    sizes = []
    for i in range(B):
        d = batch[i, : valid[i]]
        assert np.array_equal(hists[i], np.bincount(d, minlength=256))
        payload = words_to_bytes(words[i], int(total_bits[i]))
        sizes.append(len(payload))
        if native.is_available():
            assert np.array_equal(native.decode(payload, int(valid[i]), lengths[i]), d)
    assert np.array_equal(comp_bytes, sizes)
    assert np.array_equal(offsets, np.cumsum([0] + sizes[:-1]))


def test_uneven_batch_rejected(mesh8):
    batch = np.zeros((3, 1024), np.uint8)  # 3 not divisible by 8
    with pytest.raises(Exception):
        sharded_compress_arrays(mesh8, batch, np.full(3, 1024, np.int32))


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    n = min(8, len(jax.devices()))
    dryrun_multichip(n)


def test_entry_compiles():
    import sys

    import jax as j

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = j.jit(fn).lower(*args).compile()(*args)
    words, total_bits, lengths = out
    assert int(total_bits) > 0


def test_sharded_decompress_roundtrip(mesh8):
    """Full multi-chip round trip: sharded compress → sharded gap-array
    decompress → byte equality (decompress is pure DP over chunks)."""
    from datacomp_tpu.ops import (
        build_decode_tables,
        cmp_len_bucket,
        max_code_len,
        payload_to_words,
        syms_per_refill,
    )
    from datacomp_tpu.parallel import make_sharded_decompress_step

    CH = 16384
    B = 8
    SUB = 512
    blob = generate_bytes("text", B * CH)
    batch = np.frombuffer(blob, np.uint8).reshape(B, CH).copy()
    valid = np.full(B, CH, np.int32)

    out = sharded_compress_arrays(mesh8, batch, valid, subblock=SUB)
    _, lengths, _, words, total_bits, gaps, _, _ = map(np.asarray, out)

    nsub = CH // SUB
    word_arrays = [
        payload_to_words(words_to_bytes(words[i], int(total_bits[i])))
        for i in range(B)
    ]
    W = max(w.size for w in word_arrays)
    wbatch = np.zeros((B, W), np.uint32)
    for i, w in enumerate(word_arrays):
        wbatch[i, : w.size] = w
    tables = [build_decode_tables(lengths[i]) for i in range(B)]
    limits = np.stack([t[0] for t in tables])
    adj = np.stack([t[1] for t in tables])
    sym = np.stack([t[2] for t in tables])
    ml = max(max_code_len(lengths[i]) for i in range(B))

    step = make_sharded_decompress_step(
        mesh8, SUB, nsub, syms_per_refill(ml, SUB), cmp_len_bucket(ml)
    )
    decoded = np.asarray(
        step(wbatch, gaps[:, :nsub].astype(np.uint32), limits, adj, sym)
    )
    assert np.array_equal(decoded.reshape(B, CH), batch)

    # the validated convenience wrapper must agree
    from datacomp_tpu.parallel import sharded_decompress_arrays

    decoded2 = np.asarray(
        sharded_decompress_arrays(
            mesh8, wbatch, gaps[:, :nsub].astype(np.uint32),
            [lengths[i] for i in range(B)], SUB,
        )
    )
    assert np.array_equal(decoded2.reshape(B, CH), batch)


def test_decompress_step_params_validated():
    """Static decode params that cannot cover the batch's deepest codebook
    must be rejected host-side, not silently corrupt output (advisor r1)."""
    from datacomp_tpu.parallel import check_decompress_step_params

    deep = np.zeros(256, np.int32)
    deep[:64] = 12  # 12-bit codebook
    shallow = np.zeros(256, np.int32)
    shallow[:4] = 2
    batch = [shallow, deep]
    # cmp_len below the deepest codebook
    with pytest.raises(ValueError, match="cmp_len"):
        check_decompress_step_params(batch, 512, 2, cmp_len=10)
    # syms_per_step exceeding the refill budget for 12-bit codes
    with pytest.raises(ValueError, match="refill"):
        check_decompress_step_params(batch, 512, 4, cmp_len=12)
    # syms_per_step must divide the sub-block
    with pytest.raises(ValueError, match="divide"):
        check_decompress_step_params(batch, 511, 2, cmp_len=12)
    # >16-bit codebooks cannot decode on device at all
    deep17 = np.zeros(256, np.int32)
    deep17[0] = 17
    deep17[1] = 17
    with pytest.raises(ValueError, match="16"):
        check_decompress_step_params([deep17], 512, 1, cmp_len=16)
    # a covering configuration passes
    check_decompress_step_params(batch, 512, 2, cmp_len=12)


def test_mixed_batch_deep_chunk_routes_to_host(mesh8):
    """A batch containing one >16-bit-codebook chunk: the validated device
    wrapper rejects the whole batch; the dispatcher pattern device-decodes
    the shallow chunks and host-decodes the deep one (the same routing
    TpuChunkCodec.decode_chunk applies per chunk)."""
    from datacomp_tpu.core import build_codebook
    from datacomp_tpu.core.bitio import decode_bitstream_py, encode_bitstream
    from datacomp_tpu.ops import max_code_len
    from datacomp_tpu.parallel import (
        check_decompress_step_params,
        sharded_decompress_arrays,
    )

    CH = 8192
    SUB = 512
    B = 8
    blob = generate_bytes("text", B * CH)
    batch = np.frombuffer(blob, np.uint8).reshape(B, CH).copy()
    # replace chunk 3 with Fibonacci-skewed data (17-bit optimal code); the
    # filler goes to the MOST frequent symbol so the rare chain keeps depth
    fib = [1, 1]
    while len(fib) < 18:
        fib.append(fib[-1] + fib[-2])
    fib[-1] += CH - sum(fib)
    deep = np.concatenate([np.full(c, s % 256, np.uint8) for s, c in enumerate(fib)])
    batch[3] = deep

    lengths, codes, payloads = [], [], []
    for i in range(B):
        h = np.bincount(batch[i], minlength=256).astype(np.int64)
        l, c = build_codebook(h, mode="java")
        lengths.append(l)
        codes.append(c)
        payloads.append(encode_bitstream(batch[i], l, c))
    assert max_code_len(lengths[3]) > 16

    with pytest.raises(ValueError, match="16"):
        check_decompress_step_params(lengths, SUB, 2, 16)

    # dispatcher: host for deep chunks, device for the rest
    deep_ix = [i for i in range(B) if max_code_len(lengths[i]) > 16]
    shallow_ix = [i for i in range(B) if i not in deep_ix]
    for i in deep_ix:
        got = decode_bitstream_py(payloads[i], CH, lengths[i])
        assert np.array_equal(got, batch[i])
    # device path needs the gap arrays: re-encode shallow chunks with gaps
    from datacomp_tpu import native
    from datacomp_tpu.ops import payload_to_words

    if not native.is_available():
        pytest.skip("native codec unavailable for gap re-encode")
    # pad the device sub-batch to the mesh size by repeating the first
    # shallow chunk (padding rows are decoded and discarded)
    sub_batch = list(shallow_ix)
    while len(sub_batch) % 8:
        sub_batch.append(shallow_ix[0])
    words, gaps = [], []
    for i in sub_batch:
        p, g = native.encode(batch[i], lengths[i], codes[i], subblock=SUB)
        words.append(payload_to_words(bytes(p)))
        gpad = np.zeros(CH // SUB, np.uint32)
        gpad[: g.size] = g
        gaps.append(gpad)
    W = max(w.size for w in words)
    wb = np.zeros((len(sub_batch), W), np.uint32)
    for j, w in enumerate(words):
        wb[j, : w.size] = w
    out = np.asarray(
        sharded_decompress_arrays(
            mesh8, wb, np.stack(gaps), [lengths[i] for i in sub_batch], SUB
        )
    ).reshape(len(sub_batch), CH)
    for j, i in zip(range(len(shallow_ix)), shallow_ix):
        assert np.array_equal(out[j], batch[i])
