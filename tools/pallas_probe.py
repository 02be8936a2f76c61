#!/usr/bin/env python
"""Probe Pallas viability + DMA cost on the real chip, with tiny shapes first.

Round-1 finding: the conditional-DMA KNN kernel compiled-forever through the
axon Mosaic toolchain. This probe isolates the question: (1) does a trivial
Pallas kernel compile+run at all, (2) what does an UNconditional per-row DMA
cost, (3) does the dump-row-padded (conditional-free) gather design work.

Run stages individually: python tools/pallas_probe.py [stage0|stage1|stage2]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    return float(jnp.sum(x))


def stage0():
    """Trivial VMEM kernel."""
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((256, 128), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    print("stage0 compile...", flush=True)
    r = f(x)
    print("stage0 OK:", fetch(r), flush=True)


def _dma_kernel(idx_ref, src_hbm, o_ref, buf, sem, *, C, B):
    """Unconditional row gather: DMA C rows (idx may repeat; dump row legal)."""
    def body(j, _):
        pltpu.make_async_copy(
            src_hbm.at[idx_ref[j]], buf.at[j], sem.at[j % 8]
        ).start()
        return 0

    def wait(j, _):
        pltpu.make_async_copy(
            src_hbm.at[idx_ref[j]], buf.at[j], sem.at[j % 8]
        ).wait()
        return 0

    def wave(w, _):
        jax.lax.fori_loop(w * 8, jnp.minimum((w + 1) * 8, C), body, 0)
        jax.lax.fori_loop(w * 8, jnp.minimum((w + 1) * 8, C), wait, 0)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(C, 8), wave, 0)
    o_ref[:] = jnp.sum(buf[:], axis=(1,)) * 1.0


def stage1(C=64, B=64, rows=4096, tiles=8):
    """Per-row DMA cost: tiles x C row-copies of (B,3) from HBM."""
    src = jnp.arange(rows * B * 3, dtype=jnp.float32).reshape(rows, B, 3)
    idx = (jnp.arange(tiles * C, dtype=jnp.int32) * 97) % rows

    kern = functools.partial(_dma_kernel, C=C, B=B)
    f = jax.jit(lambda idx, src: pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # idx prefetched to SMEM
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((C, 3), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((C, B, 3), jnp.float32),
                pltpu.SemaphoreType.DMA((8,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((tiles * C, 3), jnp.float32),
    )(idx.reshape(tiles, C), src))
    print("stage1 compile...", flush=True)

    # NOTE: with num_scalar_prefetch=1 the index_map signature gains the
    # scalar ref; idx arrives per-tile via the grid spec convention
    r = f(idx, src)
    print("stage1 ran:", fetch(r), flush=True)

    @jax.jit
    def chained(idx, src):
        def it(i, acc):
            rr = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(tiles,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec((C, 3), lambda i, *_: (i, 0),
                                           memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((C, B, 3), jnp.float32),
                        pltpu.SemaphoreType.DMA((8,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((tiles * C, 3), jnp.float32),
            )(idx.reshape(tiles, C), src)
            return acc + jnp.sum(rr) * 1e-30
        return jax.lax.fori_loop(0, 20, it, jnp.float32(0.0))

    r = chained(idx, src)
    float(r)
    t0 = time.perf_counter()
    float(chained(idx, src))
    dt = (time.perf_counter() - t0) / 20
    n_dma = tiles * C
    print(f"stage1: {n_dma} row-DMAs ({B*3*4}B each) in {dt*1e3:.3f} ms "
          f"= {dt/n_dma*1e9:.0f} ns/DMA", flush=True)


def stage2():
    """XLA gather reference for the same access pattern."""
    rows, B = 4096, 64
    src = jnp.arange(rows * B * 3, dtype=jnp.float32).reshape(rows, B, 3)
    idx = (jnp.arange(512, dtype=jnp.int32) * 97) % rows

    @jax.jit
    def chained(idx, src):
        def it(i, acc):
            g = src[idx]
            return acc + jnp.sum(g) * 1e-30
        return jax.lax.fori_loop(0, 20, it, jnp.float32(0.0))

    float(chained(idx, src))
    t0 = time.perf_counter()
    float(chained(idx, src))
    dt = (time.perf_counter() - t0) / 20
    print(f"stage2 XLA gather: 512 rows in {dt*1e3:.3f} ms = "
          f"{dt/512*1e9:.0f} ns/row", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("stage0", "all"):
        stage0()
    if which in ("stage1", "all"):
        stage1()
    if which in ("stage2", "all"):
        stage2()
