"""Probe: Mosaic DMA-slice rules needed by 256³-class line kernels.

The 256³ Thomas kernel needs z-tiling (full-Zp slabs are ~150 MB of
VMEM — 2-3x any budget), which requires dynamic HBM slices on dim 3
at tile-multiple offsets.  Round-2 established the dim-2 (sublane)
rules (8-aligned offset AND length at Zp >= 256); this measures

1. the lane-dim (dim 3) offset granularity        -> 128-aligned only
2. the real fstack pattern: dims 0+2+3 together   -> probe3
3. the e/r slab pattern: dims 2+3 together        -> probe23
4. the residual y-tile pattern: dims 1+2 together
   (dim-1 offset dynamic/unaligned, dim-2 8-aligned) -> probe12
5. how far the scoped-VMEM limit stretches (TZ=256 slabs want ~100 MB
   if zs stays resident)                           -> probe_vmem

Run (ambient TPU env): python scripts/hw_probe_ztile.py
"""
import sys

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
        buf[...] = buf[...] + 1.0
        cp2 = pltpu.make_async_copy(
            buf, o_hbm.at[:, :, :, pl.ds(z0, tz)], sem)
        cp2.start()
        cp2.wait()

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


def probe3(Zp, tz, zalign, Yp=64, ty=16, nf=46, nx=32, chx=4,
           dt=jnp.float32):
    """The real Thomas-fstack pattern: slice dims 0 (chunk), 2 (y-slab)
    and 3 (z-tile) of a (nx, nf, Yp, Zp) HBM array simultaneously.

    ``dt=bfloat16`` checks the (16, 128)-tiled dtype still allows the
    8-granular sublane offsets the y-slab scheme uses."""

    def kernel(x_hbm, o_hbm, buf, sem):
        t = pl.program_id(0)
        zt = pl.program_id(1)
        y0 = t * (ty - 8)
        z0 = zt * zalign
        for c in range(nx // chx):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(c * chx, chx), :, pl.ds(y0, ty),
                         pl.ds(z0, tz)], buf, sem)
            cp.start()
            cp.wait()
        buf[...] = buf[...] + 1.0
        cp2 = pltpu.make_async_copy(
            buf, o_hbm.at[pl.ds(0, chx), :, pl.ds(y0, ty),
                          pl.ds(z0, tz)], sem)
        cp2.start()
        cp2.wait()

    nyt = (Yp - ty) // (ty - 8) + 1
    ntz = (Zp - tz) // zalign + 1
    call = pl.pallas_call(
        kernel,
        grid=(nyt, ntz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nx, nf, Yp, Zp), dt),
        scratch_shapes=[pltpu.VMEM((chx, nf, ty, tz), dt),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.zeros((nx, nf, Yp, Zp), dt)
    try:
        jax.jit(call).lower(x).compile()(x)
        return "OK"
    except Exception as e:
        return f"FAIL: {str(e)[:90]}"


def probe23(Zp, tz, zalign, Yp=64, ty=16, NXP=34, nf=6):
    """The e/r slab pattern: dims 2 (y, 8-aligned) + 3 (z) together."""

    def kernel(x_hbm, o_hbm, buf, sem):
        t = pl.program_id(0)
        zt = pl.program_id(1)
        y0 = t * (ty - 8)
        z0 = zt * zalign
        cp = pltpu.make_async_copy(
            x_hbm.at[:, :, pl.ds(y0, ty), pl.ds(z0, tz)], buf, sem)
        cp.start()
        cp.wait()
        buf[...] = buf[...] + 1.0
        cp2 = pltpu.make_async_copy(
            buf, o_hbm.at[:, :, pl.ds(y0, ty), pl.ds(z0, tz)], sem)
        cp2.start()
        cp2.wait()

    nyt = (Yp - ty) // (ty - 8) + 1
    ntz = (Zp - tz) // zalign + 1
    call = pl.pallas_call(
        kernel,
        grid=(nyt, ntz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nf, NXP, Yp, Zp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nf, NXP, ty, tz), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.zeros((nf, NXP, Yp, Zp), jnp.float32)
    try:
        jax.jit(call).lower(x).compile()(x)
        return "OK"
    except Exception as e:
        return f"FAIL: {str(e)[:90]}"


def probe12(Zp=384, Yp=264, tyl=64, XL=6, NXP=34, nf=6):
    """The residual y-tile pattern: dims 1 (x, dynamic clip offset —
    NOT provably aligned) + 2 (y, 8-aligned) together, z full."""

    def kernel(x_hbm, o_hbm, buf, sem):
        t = pl.program_id(0)
        yt = pl.program_id(1)
        x0 = jnp.clip(t * (XL - 2) - 1, 0, NXP - XL)
        y0 = yt * (tyl - 8)
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(x0, XL), pl.ds(y0, tyl)], buf, sem)
        cp.start()
        cp.wait()
        buf[...] = buf[...] + 1.0
        cp2 = pltpu.make_async_copy(
            buf, o_hbm.at[:, pl.ds(x0, XL), pl.ds(y0, tyl)], sem)
        cp2.start()
        cp2.wait()

    ntx = -(-(NXP - 2) // (XL - 2))
    nyt = (Yp - tyl) // (tyl - 8) + 1
    call = pl.pallas_call(
        kernel,
        grid=(ntx, nyt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nf, NXP, Yp, Zp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nf, XL, tyl, Zp), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.zeros((nf, NXP, Yp, Zp), jnp.float32)
    try:
        jax.jit(call).lower(x).compile()(x)
        return "OK"
    except Exception as e:
        return f"FAIL: {str(e)[:90]}"


def probe_vmem(mb, limit_mb):
    """Can Mosaic compile a kernel with ``mb`` MB of declared scratch
    under a ``limit_mb`` scoped-VMEM limit?"""
    rows = mb * (1 << 20) // (4 * 512)

    def kernel(x_hbm, o_hbm, buf, sem):
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 8)],
                                   buf.at[pl.ds(0, 8)], sem)
        cp.start()
        cp.wait()
        buf[0] = buf[0] + 1.0
        cp2 = pltpu.make_async_copy(buf.at[pl.ds(0, 8)],
                                    o_hbm.at[pl.ds(0, 8)], sem)
        cp2.start()
        cp2.wait()

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, 512), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, 512), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=limit_mb * (1 << 20)),
    )
    x = jnp.zeros((rows, 512), jnp.float32)
    try:
        jax.jit(call).lower(x).compile()(x)
        return "OK"
    except Exception as e:
        return f"FAIL: {str(e)[:90]}"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'lane'):
        for Zp, tz, align in [(384, 128, 128), (384, 128, 8),
                              (384, 128, 120)]:
            print(f"Zp={Zp} tz={tz} align={align}: ", end='', flush=True)
            print(probe(Zp, tz, align), flush=True)
    if which in ('all', 'patterns'):
        for Zp, tz, zalign in [(384, 256, 128), (384, 128, 128)]:
            print(f"3dim(0,2,3) Zp={Zp} tz={tz} zalign={zalign}: ",
                  end='', flush=True)
            print(probe3(Zp, tz, zalign), flush=True)
        for Zp, tz, zalign in [(384, 256, 128), (384, 128, 128)]:
            print(f"2dim(2,3) Zp={Zp} tz={tz} zalign={zalign}: ",
                  end='', flush=True)
            print(probe23(Zp, tz, zalign), flush=True)
        print("2dim(1,2) x-clip y-aligned: ", end='', flush=True)
        print(probe12(), flush=True)
    if which in ('all', 'bf16'):
        for Zp, tz, zalign in [(384, 256, 128), (384, 384, 384)]:
            print(f"bf16 3dim Zp={Zp} tz={tz} zalign={zalign}: ",
                  end='', flush=True)
            print(probe3(Zp, tz, zalign, dt=jnp.bfloat16), flush=True)
    if which in ('all', 'vmem'):
        for mb, lim in [(96, 104), (104, 112), (110, 118)]:
            print(f"vmem {mb}MB under {lim}MB: ", end='', flush=True)
            print(probe_vmem(mb, lim), flush=True)


if __name__ == '__main__':
    main()
