"""TPU-native Semantic Gaussians: open-vocabulary 3DGS in JAX/Pallas.

A from-scratch TPU-first framework with the capabilities of
sharinka0715/semantic-gaussians (3DGS training, N-channel semantic
rasterization, 2D->3D fusion, 3D distillation, open-vocab evaluation),
re-designed for XLA/Pallas/pjit. See DESIGN.md and SURVEY.md.
"""

__version__ = "0.1.0"
