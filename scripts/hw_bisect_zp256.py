#!/usr/bin/env python
"""Minimal Mosaic repros: which Thomas-kernel construct breaks at
lane dim Zp=256?

    python scripts/hw_bisect_zp256.py <case> <Zp>

cases: fbuf5d (5-D VMEM scratch index+read), rolllane (pltpu.roll on
lane dim of a 2-D tile), rollsub (roll on sublane), dynslice (dim-2
dynamic slice of 4-D HBM), station (LDL solve on (ty, Zp) tiles).
"""
import functools
import sys

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    case = sys.argv[1]
    Zp = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from emg3d_tpu.ops.pallas_gs import _compiler_params
    from emg3d_tpu import cx

    dt = jnp.float32
    ty, chx, NF, nx, NXP = 8, 8, 46, 64, 66

    def sds(sh):
        return jax.ShapeDtypeStruct(sh, dt)

    if case == 'fbuf5d':
        def kern(f_hbm, o_ref, fbuf, sems):
            cp = pltpu.make_async_copy(
                f_hbm.at[pl.ds(0, chx)], fbuf.at[0], sems.at[0])
            cp.start()
            cp.wait()
            acc = jnp.zeros((ty, Zp), dt)
            def body(i, acc):
                return acc + fbuf[0, i, 3]
            acc = lax.fori_loop(0, chx, body, acc)
            o_ref[:] = acc

        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=sds((ty, Zp)),
            scratch_shapes=[pltpu.VMEM((2, chx, NF, ty, Zp), dt),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=_compiler_params(),
        )
        args = (sds((nx, NF, ty, Zp)),)

    elif case in ('rolllane', 'rollsub'):
        ax = 1 if case == 'rolllane' else 0
        def kern(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 1, ax)

        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=sds((ty, Zp)),
            compiler_params=_compiler_params(),
        )
        args = (sds((ty, Zp)),)

    elif case == 'dynslice':
        def kern(x_hbm, o_ref, buf, sems):
            t = pl.program_id(0)
            y0 = jnp.clip(t * (ty - 2), 0, 72 - ty)
            cp = pltpu.make_async_copy(
                x_hbm.at[:, :, pl.ds(y0, ty)], buf, sems.at[0])
            cp.start()
            cp.wait()
            o_ref[:] = buf[0, 0]

        call = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=sds((ty, Zp)),
            scratch_shapes=[pltpu.VMEM((6, NXP, ty, Zp), dt),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=_compiler_params(),
        )
        args = (sds((6, NXP, 72, Zp)),)

    elif case in ('dynslice_al', 'dynslice_al12'):
        TY = 16 if case == 'dynslice_al' else 12

        def kern(x_hbm, o_ref, buf, sems):
            t = pl.program_id(0)
            y0 = t * 8
            cp = pltpu.make_async_copy(
                x_hbm.at[:, :, pl.ds(y0, TY)], buf, sems.at[0])
            cp.start()
            cp.wait()
            o_ref[:] = buf[0, 0, :ty]

        call = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=sds((ty, Zp)),
            scratch_shapes=[pltpu.VMEM((6, NXP, TY, Zp), dt),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=_compiler_params(),
        )
        args = (sds((6, NXP, 48, Zp)),)

    elif case == 'station':
        from emg3d_tpu.ops.blocksolve import ldl_solve_factored
        def kern(x_ref, o_ref):
            def c2(i):
                return cx.C2(x_ref[2 * i], x_ref[2 * i + 1])
            L = {}
            k = 0
            for i in range(1, 5):
                for j in range(i):
                    L[(i, j)] = c2(k)
                    k += 1
            dinv = [c2(10 + i) for i in range(5)]
            y = [c2(15 + i) for i in range(5)]
            z = ldl_solve_factored(5, L, dinv, y)
            o_ref[:] = sum((v.re + v.im) for v in z)

        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=sds((ty, Zp)),
            compiler_params=_compiler_params(),
        )
        args = (sds((40, ty, Zp)),)

    else:
        raise SystemExit(f"unknown case {case}")

    try:
        jax.jit(call).lower(*args).compile()
        print(f"{case} Zp={Zp}: COMPILE OK", flush=True)
    except Exception as ex:
        print(f"{case} Zp={Zp}: FAIL {str(ex)[:300]}", flush=True)


if __name__ == '__main__':
    main()
