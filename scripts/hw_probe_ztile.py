"""Probe: can Mosaic DMA-slice the LAST (lane) dim of 4-D HBM arrays?

The 256³ Thomas kernel needs z-tiling (full-Zp slabs are ~150 MB of
VMEM — 2-3x any budget), which requires dynamic HBM slices on dim 3
at tile-multiple offsets.  Round-2 established the dim-2 (sublane)
rules (8-aligned offset AND length at Zp >= 256); the lane-dim rules
are unmeasured.  This probes a minimal copy kernel at several
(offset multiple, length) combinations and prints compile/run
verdicts.

Run (ambient TPU env): python scripts/hw_probe_ztile.py
"""
import sys
import functools

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(Zp, tz, align, ny=32, nf=6, nx=20):
    """Copy kernel: grid over z-tiles at offsets tile*align."""

    def kernel(x_hbm, o_hbm, buf, sem):
        t = pl.program_id(0)
        z0 = t * align
        cp = pltpu.make_async_copy(
            x_hbm.at[:, :, :, pl.ds(z0, tz)], buf, sem)
        cp.start()
        cp.wait()
        out = pltpu.make_async_copy(
            o_hbm.at[:, :, :, pl.ds(z0, tz)], buf, sem)
        # write back buf + 1
        buf[...] = buf[...] + 1.0
        cp2 = pltpu.make_async_copy(
            buf, o_hbm.at[:, :, :, pl.ds(z0, tz)], sem)
        cp2.start()
        cp2.wait()
        del out

    ntz = (Zp - tz) // align + 1
    call = pl.pallas_call(
        kernel,
        grid=(ntz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nf, nx, ny, Zp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nf, nx, ny, tz), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.zeros((nf, nx, ny, Zp), jnp.float32)
    try:
        y = jax.jit(call).lower(x).compile()(x)
        ok = bool(np.all(np.asarray(y[..., :((ntz - 1) * align + tz)])
                         == 1.0)) if align == tz else True
        return f"OK (ran; values {'ok' if ok else 'WRONG'})"
    except Exception as e:
        return f"FAIL: {str(e)[:90]}"


def main():
    for Zp, tz, align in [(384, 128, 128), (384, 256, 128),
                          (384, 128, 8), (384, 128, 120),
                          (512, 256, 256), (384, 384, 384)]:
        print(f"Zp={Zp} tz={tz} align={align}: ", end='', flush=True)
        print(probe(Zp, tz, align), flush=True)


if __name__ == '__main__':
    main()
