"""Serving-side decode machinery shared by the live runtime and the
AOT artifact path (see ``onedc_tpu/serving/pipeline.py`` and
``onedc_tpu/serving/decoder.py``)."""

from .pipeline import DecodePrograms, pipelined_decode  # noqa: F401
