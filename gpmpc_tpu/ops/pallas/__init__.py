"""Pallas TPU kernels for the hot ops."""

from .admm_kernel import admm_chunk, pallas_available

__all__ = ["admm_chunk", "pallas_available"]
