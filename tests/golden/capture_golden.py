"""Capture golden rANS streams from the reference C++ coder.

Run once in an environment where /root/reference is mounted:

    python tests/golden/capture_golden.py

It builds a standalone oracle around the reference library
(``/root/reference/src/cpp/rans/rans.cpp`` + the core of ``ops/ops.cpp``,
with the pybind layer replaced by a file-based CLI driver replicating the
``py_rans.cpp`` container format) in a scratch dir, generates randomized
CDF tables + symbol/index sets covering the coder's corners (in-range
symbols, 2-bit bypass escapes, negative skip indexes, multi-part
streams), runs them through the oracle, and vendors the results into
``tests/golden/rans_golden.npz`` for ``tests/test_rans_golden.py``.

The vendored blob is DATA captured from the reference binary, not code.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/cpp")
HERE = Path(__file__).parent

def build_oracle(scratch: Path) -> Path:
    for f in ("rans.cpp", "rans.h", "rans_byte.h"):
        shutil.copy(REF / "rans" / f, scratch / f)
    ops = (REF / "ops" / "ops.cpp").read_text()
    ops = ops.replace("#include <pybind11/pybind11.h>", "")
    ops = ops.replace("#include <pybind11/stl.h>", "")
    i = ops.find("PYBIND11_MODULE")
    if i != -1:
        ops = ops[:i]
    (scratch / "ops_core.cpp").write_text(
        "#include <cassert>\n#include <cstdint>\n" + ops)
    driver_src = (HERE / "oracle_driver.cpp").read_text()
    (scratch / "driver.cpp").write_text(driver_src)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-pthread", "driver.cpp", "rans.cpp",
         "ops_core.cpp", "-o", "oracle"], cwd=scratch, check=True)
    return scratch / "oracle"


def gaussian_pmf(scale: float, support: int) -> np.ndarray:
    from scipy.stats import norm
    xs = np.arange(-support, support + 1, dtype=np.float64)
    p = norm.cdf(xs + 0.5, scale=scale) - norm.cdf(xs - 0.5, scale=scale)
    return np.maximum(p, 0.0).astype(np.float32)


def make_cases(rng: np.random.Generator):
    """(name, pmf_list, offsets, symbols, indexes, stream_part) tuples."""
    cases = []

    # realistic gaussian tables, shipped config (1 part)
    scales = [0.2, 0.5, 1.0, 2.5, 8.0, 24.0]
    pmfs = [gaussian_pmf(s, min(int(5 * s) + 2, 50)) for s in scales]
    offsets = [-(len(p) // 2) for p in pmfs]
    n = 4096
    idx = rng.integers(0, len(pmfs), n).astype(np.int16)
    sym = np.array([
        int(np.clip(rng.normal(0, scales[i]), -60, 60)) for i in idx],
        dtype=np.int16)
    cases.append(("gaussian_1part", pmfs, offsets, sym, idx, 1))

    # bypass-heavy: symbols far outside the CDF support
    sym_b = sym.copy()
    far = rng.integers(0, n, n // 8)
    sym_b[far] = rng.integers(-30000, 30000, len(far)).astype(np.int16)
    cases.append(("bypass_heavy", pmfs, offsets, sym_b, idx, 1))

    # negative indexes = skip (force-zero path)
    idx_s = idx.copy()
    skip = rng.integers(0, n, n // 4)
    idx_s[skip] = -1
    cases.append(("skip_indexes", pmfs, offsets, sym, idx_s, 1))

    # tiny table + uniform pmf corner
    pmfs_u = [np.full(8, 1 / 8, np.float32), gaussian_pmf(0.11, 3)]
    offs_u = [-4, -3]
    idx_u = rng.integers(0, 2, 512).astype(np.int16)
    sym_u = rng.integers(-6, 6, 512).astype(np.int16)
    cases.append(("tiny_tables", pmfs_u, offs_u, sym_u, idx_u, 1))

    # two stream parts, even split (avoids the reference's last-part
    # sizing bug at py_rans.cpp:40, which is UB for uneven splits)
    cases.append(("two_parts", pmfs, offsets, sym[:4096], idx[:4096], 2))
    return cases


def pad_cdfs(cdf_rows):
    width = max(len(c) for c in cdf_rows)
    flat = np.zeros((len(cdf_rows), width), np.int32)
    sizes = np.zeros(len(cdf_rows), np.int32)
    for i, c in enumerate(cdf_rows):
        flat[i, :len(c)] = c
        sizes[i] = len(c)
    return flat, sizes


def main():
    rng = np.random.default_rng(20250816)
    out: dict[str, np.ndarray] = {}
    with tempfile.TemporaryDirectory() as td:
        scratch = Path(td)
        oracle = build_oracle(scratch)

        def run(*args):
            subprocess.run([str(oracle)] + [str(a) for a in args],
                           check=True, cwd=scratch)

        for name, pmfs, offsets, sym, idx, parts in make_cases(rng):
            # reference CDF quantization per pmf
            cdf_rows = []
            for j, pmf in enumerate(pmfs):
                (scratch / "pmf.bin").write_bytes(
                    np.asarray(pmf, np.float32).tobytes())
                run("cdf", scratch / "pmf.bin", len(pmf), 16,
                    scratch / "cdf.bin")
                cdf = np.fromfile(scratch / "cdf.bin", np.uint32)
                assert len(cdf) == len(pmf) + 1
                cdf_rows.append(cdf.astype(np.int32))
                out[f"{name}/pmf{j}"] = np.asarray(pmf, np.float32)
            flat, sizes = pad_cdfs(cdf_rows)
            offs = np.asarray(offsets, np.int32)

            flat.tofile(scratch / "cdfs.bin")
            sizes.tofile(scratch / "sizes.bin")
            offs.tofile(scratch / "offsets.bin")
            sym.tofile(scratch / "sym.bin")
            idx.tofile(scratch / "idx.bin")
            run("enc", scratch / "cdfs.bin", flat.shape[0], flat.shape[1],
                scratch / "sizes.bin", scratch / "offsets.bin",
                scratch / "sym.bin", scratch / "idx.bin", len(sym), parts,
                scratch / "stream.bin")
            stream = np.fromfile(scratch / "stream.bin", np.uint8)

            # sanity: the oracle decodes its own stream (skipped symbols
            # decode to offset+0 per the reference semantics; compare
            # only coded positions)
            run("dec", scratch / "cdfs.bin", flat.shape[0], flat.shape[1],
                scratch / "sizes.bin", scratch / "offsets.bin",
                scratch / "stream.bin", len(stream),
                scratch / "idx.bin", len(idx), parts, scratch / "out.bin")
            dec = np.fromfile(scratch / "out.bin", np.int16)
            coded = idx >= 0
            assert np.array_equal(dec[coded], sym[coded]), name

            out[f"{name}/cdfs"] = flat
            out[f"{name}/sizes"] = sizes
            out[f"{name}/offsets"] = offs
            out[f"{name}/symbols"] = sym
            out[f"{name}/indexes"] = idx
            out[f"{name}/stream"] = stream
            out[f"{name}/decoded"] = dec
            out[f"{name}/parts"] = np.asarray([parts], np.int32)
            print(f"{name}: {len(sym)} syms -> {len(stream)} bytes "
                  f"({parts} part(s))")

    np.savez_compressed(HERE / "rans_golden.npz", **out)
    print("wrote", HERE / "rans_golden.npz")


if __name__ == "__main__":
    sys.exit(main())
