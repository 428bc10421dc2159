"""Serving-side encode/decode machinery shared by the live runtime and
the AOT artifact path (see ``onedc_tpu/serving/pipeline.py``,
``onedc_tpu/serving/decoder.py`` and ``onedc_tpu/serving/encoder.py``)."""

from .pipeline import DecodePrograms, pipelined_decode  # noqa: F401


def __getattr__(name):
    # lazy: these pull in the native rANS build + jax.export
    if name == "ServingDecoder":
        from .decoder import ServingDecoder
        return ServingDecoder
    if name == "ServingEncoder":
        from .encoder import ServingEncoder
        return ServingEncoder
    raise AttributeError(name)
