"""Capture the gaussian + laplace quantized-CDF banks from the reference.

Run once where /root/reference is mounted:

    python tests/golden/capture_cdf_tables.py

Runs the REAL reference ``GaussianEncoder.update`` (torch f32 math — the
source of the documented 1-ulp erf/exp drift vs a float64 recomputation)
for both distributions, with only the CDF quantizer routed to our
golden-validated ``pmf_to_quantized_cdf_np`` (itself byte-exact vs the
reference C++; see tests/test_rans_golden.py), and vendors the resulting
tables into ``onedc_tpu/entropy/data/{gaussian,laplace}_cdf16.npz``.

The vendored blobs are DATA captured from the reference's own update
path, not code; ``build_cdf_table(allow_vendored=False)`` remains the
executable spec and ``tests/test_reference_parity.py`` re-derives and
checks both tables.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REF_SRC = Path("/root/reference/src")
OUT_DIR = Path(__file__).resolve().parents[2] / "onedc_tpu" / "entropy" / "data"


def main():
    sys.path.insert(0, str(REF_SRC))
    import torch

    from modules.entropy import entropy_models as em

    from onedc_tpu.ops.rans import pmf_to_quantized_cdf_np

    class FakeCoder:
        def add_cdf(self, cdf, length, offset):
            self.cdf = np.asarray(cdf)
            self.length = np.asarray(length)
            self.offset = np.asarray(offset)
            return 0

    orig = em.EntropyCoder.pmf_to_quantized_cdf
    em.EntropyCoder.pmf_to_quantized_cdf = staticmethod(
        lambda pmf, precision=16: torch.tensor(
            pmf_to_quantized_cdf_np(np.asarray(pmf, np.float32),
                                    precision).astype(np.int64)))
    try:
        for distribution in ("gaussian", "laplace"):
            enc = em.GaussianEncoder(distribution=distribution)
            fake = FakeCoder()
            enc.update(force=True, entropy_coder=fake)
            out = OUT_DIR / f"{distribution}_cdf16.npz"
            np.savez_compressed(
                out,
                quantized_cdf=fake.cdf.astype(np.int32),
                cdf_length=fake.length.astype(np.int32),
                offset=fake.offset.astype(np.int32))
            print(f"{distribution}: cdf {fake.cdf.shape} -> {out}")
    finally:
        em.EntropyCoder.pmf_to_quantized_cdf = orig


if __name__ == "__main__":
    sys.exit(main())
