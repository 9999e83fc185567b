"""Fused Pallas TPU kernels for the encode->MLP->composite hot chain."""
