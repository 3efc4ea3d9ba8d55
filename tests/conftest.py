"""Test configuration: CPU backend, 8 virtual devices, float64.

The production environment routes jax to the TPU (axon) backend via a
sitecustomize hook, so by the time pytest starts, jax may already be
imported with platform 'axon'.  We force the CPU platform (complex128
support, needed for float64 parity tests against the reference golden
data) and 8 virtual host devices for the sharding tests.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

assert jax.default_backend() == 'cpu'
_ndev = len(jax.devices())


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    Long single-process runs of the full suite accumulate hundreds of
    XLA:CPU executables (the interpret-mode Pallas tests are large)
    and have been observed to segfault *inside* XLA's compile on this
    box (~1 in 2 full runs; never twice in the same place, never in a
    fresh process).  Clearing the caches per module keeps the
    in-process compiler state small; if a run still segfaults, rerun
    the remaining files — every test passes in a fresh process.
    """
    yield
    import jax as _jax
    _jax.clear_caches()
