"""Reference-trajectory layer: analytic profiles, SCVX, trajectory library."""

from .profiles import cubic_descent_reference, pad_reference

__all__ = ["cubic_descent_reference", "pad_reference"]
