"""Precision policy helpers.

The reference (emg3d, /root/reference) computes everything in
complex128/float64 (numba on CPU).  On TPU the native fast path is
float32/complex64; float64 is software-emulated.  We therefore follow JAX's
global x64 flag: with ``jax.config.update("jax_enable_x64", True)`` (used by
the CPU validation test-suite) everything runs in float64/complex128 and
matches the reference bit-tolerance; without it (TPU production path)
float32/complex64 are used.
"""
import jax.numpy as jnp
import numpy as np


def real_dtype():
    """Current default real dtype (float64 iff x64 is enabled)."""
    return jnp.zeros(0).dtype


def complex_dtype(real=None):
    """Complex dtype matching ``real`` (or the current default real dtype)."""
    if real is None:
        real = real_dtype()
    return np.result_type(real, np.complex64)


def is_complex(dtype):
    return np.issubdtype(np.dtype(dtype), np.complexfloating)
