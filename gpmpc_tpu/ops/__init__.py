"""Numerics substrate: QP solvers, linear algebra, kNN, k-means, Pallas kernels."""

from . import qp

__all__ = ["qp"]
