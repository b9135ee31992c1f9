"""Probe which Pallas/Mosaic features work on the current TPU runtime.

Each case runs in its own subprocess so a TPU-worker crash (kernel fault)
doesn't take down the harness.  Usage: python tools/probe_pallas.py [case...]
"""

from __future__ import annotations

import subprocess
import sys

CASES = {}


def case(name):
    def deco(fn):
        CASES[name] = fn
        return fn

    return deco


@case("dma_copy_basic")
def dma_copy_basic():
    """HBM -> VMEM scratch -> output, whole-array DMA."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, scratch, sem):
        cp = pltpu.make_async_copy(x_hbm, scratch, sem)
        cp.start()
        cp.wait()
        o_ref[:] = scratch[:] * 2.0

    x = jnp.ones((64, 128), jnp.float32)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    assert float(y[0, 0]) == 2.0


@case("dma_sliced_rows")
def dma_sliced_rows():
    """Grid over row tiles; DMA a dynamic row slab of a 2D HBM ref."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, scratch, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * 16, 16), :], scratch, sem)
        cp.start()
        cp.wait()
        o_ref[:] = scratch[:] * 2.0

    x = jnp.ones((64, 128), jnp.float32)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    assert float(y[0, 0]) == 2.0


@case("dma_4d_batch_rows")
def dma_4d_batch_rows():
    """4D ref, scalar batch index + dynamic row slab (the upfirdn pattern)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * 8, 8), :, :], scratch, sem
        )
        cp.start()
        cp.wait()
        o_ref[0] = scratch[:] * 2.0

    x = jnp.ones((2, 32, 16, 128), jnp.float32)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, 16, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((8, 16, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    assert float(y[0, 0, 0, 0]) == 2.0


@case("dma_overlap_slabs")
def dma_overlap_slabs():
    """Overlapping slabs (halo reads): rows [i*8, i*8+11)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * 8, 11), :, :], scratch, sem
        )
        cp.start()
        cp.wait()
        acc = scratch[0:8] + scratch[1:9] + scratch[2:10] + scratch[3:11]
        o_ref[0] = acc

    x = jnp.ones((2, 35, 16, 128), jnp.float32)  # 32 + 3 halo rows
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 32, 16, 128), x.dtype),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, 16, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((11, 16, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    assert float(y[0, 0, 0, 0]) == 4.0


@case("dma_odd_widths")
def dma_odd_widths():
    """Unaligned W (35) and odd scratch rows, like the real padded images."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * 8, 11), :, :], scratch, sem
        )
        cp.start()
        cp.wait()
        acc = (
            scratch[0:8, 0:32]
            + scratch[1:9, 1:33]
            + scratch[2:10, 2:34]
            + scratch[3:11, 3:35]
        )
        o_ref[0] = acc

    x = jnp.ones((2, 35, 35, 128), jnp.float32)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 32, 32, 128), x.dtype),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, 32, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((11, 35, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    assert float(y[0, 0, 0, 0]) == 4.0


@case("smem_taps")
def smem_taps():
    """FIR taps as a small f32 array in SMEM, scalar-indexed."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(k_ref, x_ref, o_ref):
        acc = x_ref[:] * k_ref[0, 0]
        for t in range(1, 4):
            acc += x_ref[:] * k_ref[0, t]
        o_ref[:] = acc

    k = jnp.asarray([[1.0, 2.0, 3.0, 4.0]], jnp.float32)
    x = jnp.ones((64, 128), jnp.float32)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))(k, x)
    assert float(y[0, 0]) == 10.0


@case("bf16_stencil")
def bf16_stencil():
    """bf16 compute with shifted slices (no small bf16 blocks)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        x = x_ref[:].astype(jnp.float32)
        acc = x[0:32, 0:32] + x[1:33, 1:33] + x[2:34, 2:34] + x[3:35, 3:35]
        o_ref[:] = acc.astype(jnp.bfloat16)

    x = jnp.ones((35, 35), jnp.bfloat16)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 32), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))(x)
    assert float(y[0, 0]) == 4.0


@case("upfirdn_current_f32_tiny")
def upfirdn_current_f32_tiny():
    """The shipped kernel, smallest real shape."""
    import jax, jax.numpy as jnp
    from multi_stylegan_tpu.ops.pallas_kernels import upfirdn2d_pallas
    from multi_stylegan_tpu.ops.blur import make_blur_kernel

    k = make_blur_kernel((1, 3, 3, 1))
    x = jnp.ones((1, 8, 8, 128), jnp.float32)
    y = upfirdn2d_pallas(x, k, 1, (2, 1, 2, 1))
    assert y.shape == (1, 8, 8, 128), y.shape
    float(y[0, 0, 0, 0])


def main():
    is_child = "--child" in sys.argv
    names = [a for a in sys.argv[1:] if a != "--child"] or list(CASES)
    if is_child:
        assert len(names) == 1 and names[0] in CASES, names
        CASES[names[0]]()
        return
    for name in names:
        r = subprocess.run(
            [sys.executable, __file__, name, "--child"],
            capture_output=True, text=True, timeout=420,
        )
        if r.returncode == 0:
            print(f"{name:28s} OK")
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            msg = tail[-1][:140] if tail else "?"
            print(f"{name:28s} FAIL rc={r.returncode} {msg}")



# --- appended probes: final upfirdn design building blocks ---

def _register_extra():
    pass


@case("inkernel_value_pad")
def inkernel_value_pad():
    """DMA aligned slab, jnp.pad the VALUES in-kernel (width borders)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * 8, 11), :, :], scratch, sem
        )
        cp.start()
        cp.wait()
        v = scratch[:]                       # [11, 32, 128] aligned
        vp = jnp.pad(v, ((0, 0), (2, 1), (0, 0)))  # width borders in-register
        acc = None
        for ky in range(4):
            for kx in range(4):
                sl = vp[ky : ky + 8, kx : kx + 32, :]
                acc = sl if acc is None else acc + sl
        o_ref[0] = acc

    x = jnp.ones((2, 35, 32, 128), jnp.float32)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 32, 32, 128), x.dtype),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, 32, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((11, 32, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    # interior value: 16 taps of 1.0, minus the zero-padded columns
    assert float(y[0, 4, 16, 0]) == 16.0, float(y[0, 4, 16, 0])


@case("when_dma_border_rows")
def when_dma_border_rows():
    """Static-size DMA variants under @pl.when for first/middle/last tiles."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, HIN, PT = 8, 11, 2  # tile rows, slab rows, top pad

    def kernel(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        n = pl.num_programs(1)
        scratch[:] = jnp.zeros_like(scratch)

        @pl.when(i == 0)
        def _first():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, HIN - PT), :, :],
                scratch.at[pl.ds(PT, HIN - PT), :, :],
                sem,
            )
            cp.start()
            cp.wait()

        @pl.when((i > 0) & (i < n - 1))
        def _mid():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(i * TH - PT, HIN), :, :], scratch, sem
            )
            cp.start()
            cp.wait()

        @pl.when((i == n - 1) & (i > 0))
        def _last():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(i * TH - PT, HIN - 1), :, :],
                scratch.at[pl.ds(0, HIN - 1), :, :],
                sem,
            )
            cp.start()
            cp.wait()

        acc = None
        for ky in range(4):
            sl = scratch[ky : ky + TH, :, :]
            acc = sl if acc is None else acc + sl
        o_ref[0] = acc

    x = jnp.ones((2, 32, 32, 128), jnp.float32)  # NO host-side pad
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 32, 32, 128), x.dtype),
        grid=(2, 4),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, 32, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((11, 32, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    # interior rows see 4 taps; first two output rows see fewer (zero pad)
    assert float(y[0, 4, 0, 0]) == 4.0, float(y[0, 4, 0, 0])
    assert float(y[0, 0, 0, 0]) == 2.0, float(y[0, 0, 0, 0])


@case("channel_tile_dma")
def channel_tile_dma():
    """Strided DMA over the minor (channel) dim: grid over channel tiles."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, :, :, pl.ds(j * 128, 128)], scratch, sem
        )
        cp.start()
        cp.wait()
        o_ref[0] = scratch[:] * 2.0

    x = jnp.ones((2, 16, 32, 384), jnp.float32)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(2, 3),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 16, 32, 128), lambda b, j: (b, 0, 0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((16, 32, 128), jnp.float32), pltpu.SemaphoreType.DMA],
    ))(x)
    assert float(y[1, 5, 7, 300]) == 2.0


@case("bf16_dma_stencil")
def bf16_dma_stencil():
    """bf16 slab DMA + f32 accumulate + bf16 store (the real dtype path)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(k_smem, x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * 8, 11), :, :], scratch, sem
        )
        cp.start()
        cp.wait()
        v = scratch[:].astype(jnp.float32)
        acc = None
        for ky in range(4):
            sl = v[ky : ky + 8, :, :] * k_smem[0, ky]
            acc = sl if acc is None else acc + sl
        o_ref[0] = acc.astype(jnp.bfloat16)

    k = jnp.asarray([[1.0, 2.0, 2.0, 1.0]], jnp.float32)
    x = jnp.ones((2, 35, 32, 128), jnp.bfloat16)
    y = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 32, 32, 128), jnp.bfloat16),
        grid=(2, 4),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 32, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((11, 32, 128), jnp.bfloat16), pltpu.SemaphoreType.DMA],
    ))(k, x)
    assert float(y[0, 4, 0, 0]) == 6.0, float(y[0, 4, 0, 0])


if __name__ == "__main__":
    main()
