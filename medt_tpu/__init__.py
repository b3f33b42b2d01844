"""medt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) medical image segmentation
framework with the capabilities of jeya-maria-jose/Medical-Transformer.

Gated axial-attention U-Nets (axialunet / gatedaxialunet / MedT / logo),
re-designed TPU-first: NHWC layouts, einsum attention on the MXU, functional
state, mesh-sharded training, and fused Pallas kernels for the hot path.
"""

__version__ = "0.1.0"
