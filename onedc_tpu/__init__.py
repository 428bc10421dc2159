"""OneDC-TPU: a TPU-native one-step diffusion image codec framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the OneDC
reference (onedc-codec/onedc): a learned latent compression module
(analysis/synthesis transforms + FSQ-quantized hyperprior + Gaussian
conditional entropy model + host-side rANS coding in C++) coupled with a
one-step DMD2-distilled SD1.5 UNet generator and an SD VAE decoder.

Layout
------
- ``onedc_tpu.ops``       host-side native ops: rANS coder, CDF quantizer
- ``onedc_tpu.entropy``   device-side entropy models + bitstream framing
- ``onedc_tpu.nn``        Flax neural building blocks (NHWC, TPU-native)
- ``onedc_tpu.models``    codec / generator / composite models
- ``onedc_tpu.parallel``  mesh + sharding helpers (pjit/shard_map)
- ``onedc_tpu.train``     losses, trainers, checkpointing
- ``onedc_tpu.eval``      metrics and quality harness
- ``onedc_tpu.data``      datasets
"""

__version__ = "0.1.0"
