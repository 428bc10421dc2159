"""Serving-side decode machinery shared by the live runtime and the
AOT artifact path (see ``onedc_tpu/serving/pipeline.py`` and
``onedc_tpu/serving/decoder.py``)."""

from .pipeline import DecodePrograms, pipelined_decode  # noqa: F401


def __getattr__(name):
    # lazy: ServingDecoder pulls in the native rANS build + jax.export
    if name == "ServingDecoder":
        from .decoder import ServingDecoder
        return ServingDecoder
    raise AttributeError(name)
