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

# XLA:CPU's LLVM JIT creates ~10k small mmaps PER compiled multigrid
# cycle configuration (measured: /proc/<pid>/maps grows ~10k per
# (sc, lr) piece set on the 8-device mesh); the kernel default
# vm.max_map_count=65530 then kills compiles mid-suite with "LLVM
# compilation error: Cannot allocate memory" followed by a segfault.
# Raise it (root; best-effort) — this, not compiler state size, was
# the root cause of the historical flaky full-suite segfaults.
try:
    with open('/proc/sys/vm/max_map_count') as _f:
        if int(_f.read()) < 1048576:
            with open('/proc/sys/vm/max_map_count', 'w') as _g:
                _g.write('4194304')
except (OSError, ValueError):
    pass

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
