"""Unit tests for bench.py's probe-scaled throughput projection.

The projection is the quantitative bridge between a degraded tunnel
session's measurement and the 20 decodes/s target's natural habitat (a
non-throttled v5e) — see ROADMAP "Round-4 roofline closure". These tests
pin the model's algebra so a bench refactor can't silently change what
the projected keys mean.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

_BENCH = Path(__file__).resolve().parent.parent / "bench.py"


@pytest.fixture(scope="module")
def bench():
    # bench.py imports jax at module scope but the projection helpers are
    # pure; loading the module does not touch a device.
    spec = importlib.util.spec_from_file_location("onedc_bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["onedc_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_projection_identity_at_reference_probes(bench):
    """Measured AT the reference probes -> projection == measurement."""
    keys = bench.projection_keys(headline=15.0, tf=bench.REF_TF,
                                 hbm=bench.REF_HBM, floor_ms=50.0)
    assert keys["lambda_projected_healthy_decodes_per_sec"] == \
        pytest.approx(15.0, rel=1e-3)
    # exposure = 1000/15 - 50
    assert keys["lambda_pipeline_exposure_ms_per_img"] == \
        pytest.approx(1000.0 / 15.0 - 50.0, abs=0.01)


def test_projection_scales_floor_not_exposure(bench):
    """Half-speed probes: the device floor doubles back to reference,
    the exposure term is untouched."""
    floor, headline = 60.0, 12.0
    tf, hbm = bench.REF_TF / 2, bench.REF_HBM / 2
    keys = bench.projection_keys(headline, tf, hbm, floor)
    exposure = 1000.0 / headline - floor
    expected = 1000.0 / (floor * 0.5 + exposure)
    assert keys["lambda_projected_healthy_decodes_per_sec"] == \
        pytest.approx(expected, rel=1e-3)


def test_projection_takes_less_optimistic_scaling(bench):
    """MXU probe healthy but HBM degraded -> the HBM ratio (larger
    scale, smaller projected gain) must win."""
    keys = bench.projection_keys(
        headline=12.0, tf=bench.REF_TF, hbm=bench.REF_HBM / 2,
        floor_ms=60.0)
    exposure = 1000.0 / 12.0 - 60.0
    # scale = max(1.0, 0.5) = 1.0 -> no projected gain from the floor
    assert keys["lambda_projected_healthy_decodes_per_sec"] == \
        pytest.approx(1000.0 / (60.0 + exposure), rel=1e-3)


def test_spec_projection_is_more_optimistic_than_healthy(bench):
    keys = bench.projection_keys(headline=13.7, tf=78.3, hbm=195.7,
                                 floor_ms=57.4)
    assert (keys["lambda_projected_spec_v5e_decodes_per_sec"]
            > keys["lambda_projected_healthy_decodes_per_sec"]
            > 13.7)


def test_projection_clamps_negative_exposure(bench):
    """Throughput above the floor's ceiling (timing jitter) must not
    produce a negative exposure term."""
    keys = bench.projection_keys(headline=25.0, tf=80.0, hbm=200.0,
                                 floor_ms=50.0)   # 1000/25 = 40 < 50
    assert keys["lambda_pipeline_exposure_ms_per_img"] == 0.0
