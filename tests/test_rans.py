"""rANS coder tests: round-trips, native/python cross-checks, containers."""

import numpy as np
import pytest

from onedc_tpu.ops import (
    NativeRansDecoder,
    NativeRansEncoder,
    PyRansDecoder,
    PyRansEncoder,
    get_native_lib,
    pmf_to_quantized_cdf,
    pmf_to_quantized_cdf_np,
)

HAS_NATIVE = get_native_lib() is not None


def make_gaussian_cdfs(n_cdf=8, seed=0):
    """Small bank of quantized CDFs with varying support widths."""
    rng = np.random.default_rng(seed)
    sizes, offsets, rows = [], [], []
    max_width = 0
    for i in range(n_cdf):
        half = int(rng.integers(2, 20))
        support = np.arange(-half, half + 1, dtype=np.float64)
        sigma = 0.3 + 3.0 * rng.random()
        pmf = np.exp(-0.5 * (support / sigma) ** 2)
        pmf = pmf / pmf.sum() * 0.995
        tail = 1.0 - pmf.sum()
        full = np.concatenate([pmf, [tail]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf_np(full)
        rows.append(cdf.astype(np.int32))
        sizes.append(len(cdf))
        offsets.append(-half)
        max_width = max(max_width, len(cdf))
    table = np.zeros((n_cdf, max_width), dtype=np.int32)
    for i, r in enumerate(rows):
        table[i, :len(r)] = r
    return table, np.array(sizes, np.int32), np.array(offsets, np.int32)


def random_payload(sizes, offsets, n, seed, escape_frac=0.02, skip_frac=0.05):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(sizes), size=n).astype(np.int16)
    sym = np.empty(n, dtype=np.int16)
    for i in range(n):
        k = idx[i]
        lo = offsets[k]
        hi = offsets[k] + sizes[k] - 3  # in-range symbol values
        sym[i] = rng.integers(lo, hi + 1)
    # escapes: push some symbols outside the modeled range
    esc = rng.random(n) < escape_frac
    sym[esc] = (sym[esc].astype(np.int32) +
                rng.choice([-900, 900], size=esc.sum())).clip(-30000, 30000)
    # skips: negative index means "not coded, decode as 0"
    skip = rng.random(n) < skip_frac
    idx[skip] = -1
    return sym, idx


@pytest.mark.parametrize("coder", ["python"] + (["native"] if HAS_NATIVE else []))
@pytest.mark.parametrize("stream_part", [1, 2])
def test_roundtrip(coder, stream_part):
    table, sizes, offsets = make_gaussian_cdfs()
    sym, idx = random_payload(sizes, offsets, 4096, seed=1)
    if coder == "native":
        enc, dec = NativeRansEncoder(False, stream_part), NativeRansDecoder(stream_part)
    else:
        enc, dec = PyRansEncoder(False, stream_part), PyRansDecoder(stream_part)
    g_e = enc.add_cdf(table, sizes, offsets)
    g_d = dec.add_cdf(table, sizes, offsets)
    assert g_e == g_d == 0
    enc.reset()
    enc.encode_with_indexes(sym, idx, 0)
    enc.flush()
    stream = enc.get_encoded_stream()
    assert stream.dtype == np.uint8 and len(stream) > 4

    dec.set_stream(stream)
    out = dec.decode_stream(idx, 0)
    expect = sym.copy()
    expect[idx < 0] = 0
    np.testing.assert_array_equal(out, expect)


@pytest.mark.skipif(not HAS_NATIVE, reason="native library unavailable")
@pytest.mark.parametrize("stream_part", [1, 2, 3])
def test_native_matches_python_bitstream(stream_part):
    """The native coder must produce byte-identical streams to the spec."""
    table, sizes, offsets = make_gaussian_cdfs(seed=3)
    sym, idx = random_payload(sizes, offsets, 2048, seed=7)

    enc_py = PyRansEncoder(False, stream_part)
    enc_py.add_cdf(table, sizes, offsets)
    enc_py.encode_with_indexes(sym, idx, 0)
    enc_py.flush()
    s_py = enc_py.get_encoded_stream()

    enc_c = NativeRansEncoder(False, stream_part)
    enc_c.add_cdf(table, sizes, offsets)
    enc_c.encode_with_indexes(sym, idx, 0)
    enc_c.flush()
    s_c = enc_c.get_encoded_stream()

    np.testing.assert_array_equal(s_py, s_c)

    # cross-decode: python decodes the native stream
    dec = PyRansDecoder(stream_part)
    dec.add_cdf(table, sizes, offsets)
    dec.set_stream(s_c)
    out = dec.decode_stream(idx, 0)
    expect = sym.copy()
    expect[idx < 0] = 0
    np.testing.assert_array_equal(out, expect)


@pytest.mark.skipif(not HAS_NATIVE, reason="native library unavailable")
def test_multiple_encode_calls_single_flush():
    """Four-part prior semantics: 4 encode calls buffered into one stream."""
    table, sizes, offsets = make_gaussian_cdfs(seed=5)
    parts = [random_payload(sizes, offsets, 512, seed=10 + i) for i in range(4)]

    enc = NativeRansEncoder(False, 1)
    enc.add_cdf(table, sizes, offsets)
    enc.reset()
    for sym, idx in parts:
        enc.encode_with_indexes(sym, idx, 0)
    enc.flush()
    stream = enc.get_encoded_stream()

    dec = NativeRansDecoder(1)
    dec.add_cdf(table, sizes, offsets)
    dec.set_stream(stream)
    for sym, idx in parts:
        out = dec.decode_stream(idx, 0)
        expect = sym.copy()
        expect[idx < 0] = 0
        np.testing.assert_array_equal(out, expect)


def test_cdf_quantizer_properties():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(3, 200))
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf_np(pmf)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf.astype(np.int64)) > 0)


@pytest.mark.skipif(not HAS_NATIVE, reason="native library unavailable")
def test_cdf_quantizer_native_matches_numpy():
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(3, 150))
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum()
        # include tiny probabilities that force frequency stealing
        pmf[rng.integers(0, n)] = 1e-9
        np.testing.assert_array_equal(
            pmf_to_quantized_cdf(pmf), pmf_to_quantized_cdf_np(pmf))


def test_empty_symbol_stream():
    table, sizes, offsets = make_gaussian_cdfs()
    enc = PyRansEncoder()
    enc.add_cdf(table, sizes, offsets)
    enc.flush()
    stream = enc.get_encoded_stream()
    dec = PyRansDecoder()
    dec.add_cdf(table, sizes, offsets)
    dec.set_stream(stream)
    out = dec.decode_stream(np.full(5, -1, np.int16), 0)
    np.testing.assert_array_equal(out, np.zeros(5, np.int16))


@pytest.mark.skipif(not HAS_NATIVE, reason="native lib unavailable")
@pytest.mark.parametrize("stream_part", [1, 2])
def test_decode_streams_multi_matches_serial(stream_part):
    """The batched multi-stream decode (one native call for all
    streams) must be byte-identical to per-decoder decode_stream —
    incl. escapes, skips, and multi-part containers."""
    from onedc_tpu.ops.rans import decode_streams_multi

    table, sizes, offsets = make_gaussian_cdfs()
    n_dec, n = 5, 977
    streams, idxs, syms = [], [], []
    for d in range(n_dec):
        sym, idx = random_payload(sizes, offsets, n, seed=100 + d,
                                  escape_frac=0.05, skip_frac=0.08)
        enc = NativeRansEncoder(stream_part=stream_part)
        g = enc.add_cdf(table, sizes, offsets)
        enc.encode_with_indexes(sym, idx, g)
        enc.flush()
        streams.append(enc.get_encoded_stream())
        idxs.append(idx)
        # the decoded symbol for skipped entries is 0 by contract
        sym = sym.copy()
        sym[idx < 0] = 0
        syms.append(sym)

    decs = []
    for s in streams:
        dec = NativeRansDecoder(stream_part=stream_part)
        g = dec.add_cdf(table, sizes, offsets)
        dec.set_stream(s)
        decs.append(dec)
    batched = decode_streams_multi(decs, np.stack(idxs), g)
    np.testing.assert_array_equal(batched, np.stack(syms))

    # and identical to the serial per-decoder path on fresh decoders
    for s, idx, sym in zip(streams, idxs, syms):
        dec = NativeRansDecoder(stream_part=stream_part)
        g = dec.add_cdf(table, sizes, offsets)
        dec.set_stream(s)
        np.testing.assert_array_equal(dec.decode_stream(idx, g), sym)
