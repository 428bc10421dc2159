from .rans import (  # noqa: F401
    NativeRansDecoder,
    NativeRansEncoder,
    PyRansDecoder,
    PyRansEncoder,
    RansDecoder,
    RansEncoder,
    get_native_lib,
    pmf_to_quantized_cdf,
    pmf_to_quantized_cdf_np,
)
