#!/usr/bin/env python
"""Bisect the 128^3 line-kernel compile failure: residual kernel and
Thomas kernel compiled SEPARATELY with dummy inputs.

    python scripts/hw_bisect_lr128.py 128 res 4
    python scripts/hw_bisect_lr128.py 128 thomas 8
"""
import functools
import sys

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else '128'
    n = None if ',' in spec else int(spec)
    which = sys.argv[2] if len(sys.argv) > 2 else 'res'
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else (4 if which == 'res'
                                                       else 8)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from emg3d_tpu.ops import pallas_lr
    from emg3d_tpu.ops.pallas_gs import padded_dims, _compiler_params

    shape = (n, n, n) if n is not None else \
        tuple(int(p) for p in spec.split(','))
    nx, ny, nz = shape
    Yp, Zp, NXP = padded_dims(shape)
    dt = jnp.float32
    print(f"{which} tile={tile} Yp={Yp} Zp={Zp} NXP={NXP} "
          f"limit={pallas_lr._vmem_limit()}", flush=True)

    def sds(sh):
        return jax.ShapeDtypeStruct(sh, dt)

    if which == 'res':
        tx = tile
        call = pl.pallas_call(
            functools.partial(pallas_lr._kernel_res, tx=tx, nx=nx),
            grid=(-(-nx // tx),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 +
                     [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((6, NXP, Yp, Zp), dt),
            scratch_shapes=[
                pltpu.VMEM((6, tx + 2, Yp, Zp), dt),
                pltpu.VMEM((6, tx + 2, Yp, Zp), dt),
                pltpu.VMEM((9, tx + 2, Yp, Zp), dt),
                pltpu.VMEM((tx + 2, 1, Zp), dt),
                pltpu.VMEM((6, tx + 2, Yp, Zp), dt),
                pltpu.SemaphoreType.DMA((5,)),
            ],
            input_output_aliases={6: 0},
            compiler_params=_compiler_params(),
        )
        args = (sds((6, NXP, Yp, Zp)), sds((6, NXP, Yp, Zp)),
                sds((9, NXP, Yp, Zp)), sds((NXP, 1, Zp)),
                sds((1, Yp, Zp)), sds((1, 1, Zp)),
                sds((6, NXP, Yp, Zp)))
    else:
        ty = tile
        chx = min(8, nx)
        nch = -(-nx // chx)
        to = ty - 2
        nyt = max(1, -(-(ny - 1) // to))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nyt,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((6, NXP, ty, Zp), dt),
                pltpu.VMEM((6, NXP, ty, Zp), dt),
                pltpu.VMEM((10, nx, ty, Zp), dt),
                pltpu.VMEM((2, chx, pallas_lr._NF, ty, Zp), dt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        call = pl.pallas_call(
            functools.partial(pallas_lr._kernel_thomas, nx=nx,
                              nyz=(ny, nz), ty=ty, chx=chx, nch=nch),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((6, NXP, Yp, Zp), dt),
            input_output_aliases={3: 0},
            compiler_params=_compiler_params(),
        )
        args = (jax.ShapeDtypeStruct((1,), jnp.int32),
                sds((6, NXP, Yp, Zp)),
                sds((nx, pallas_lr._NF, Yp, Zp)),
                sds((6, NXP, Yp, Zp)))

    try:
        jax.jit(call).lower(*args).compile()
        print("COMPILE OK", flush=True)
    except Exception as ex:
        print("FAIL:", str(ex)[:2000], flush=True)


if __name__ == '__main__':
    main()
