"""Pallas TPU kernel for the local correlation cost volume.

Strategy: grid over row tiles.  f1 is row-blocked into VMEM via BlockSpec;
the zero-padded f2 stays in HBM (ANY) and each program DMAs its overlapping
halo window [i*TH, i*TH + TH + 2P) into a VMEM scratch buffer (halo windows
overlap between programs, which BlockSpec row-blocking cannot express).  The
K*K displacement loop is a static Python unroll of VPU multiply-reduces over
the channel (lane) dimension, so Mosaic emits one fused loop nest with purely
static addressing.

The host-side wrapper pre-pads f2 (zeros — the reference kernels' boundary
semantics), rounds channels up to the 128-lane boundary and the padded width
to the sublane boundary.

Supported: out_stride == 1 (covers PWC-Net 81-ch, LiteFlowNet fine-level
49-ch, LFN3 cross- and dilated self-correlation).  NOT dispatched in
production: ``local_correlation`` ships the lax form unconditionally
(this kernel measured ~11% slower at the model shapes — both forms are
VPU/bandwidth-bound; see ops/__init__ and the README demotion note);
``correlation_pallas_call`` stays importable for direct use and tests.

Gradients: ``jax.custom_vjp`` whose backward is the autodiff adjoint of the
lax reference implementation — the exact math of the reference's hand-written
backward kernels (correlation_cuda_kernel.cu:150-334).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .correlation import correlation_lax

_TH = 8  # rows per program


from ..core.backend import on_tpu as _on_tpu


def _corr_kernel(
    f1_ref, f2_ref, out_ref, f2_vmem, sem, *, K: int, disp_stride: int, P: int, C: int, W: int
):
    i = pl.program_id(0)
    TH = f1_ref.shape[0]
    rows = TH + 2 * P
    dma = pltpu.make_async_copy(
        f2_ref.at[pl.ds(i * TH, rows)], f2_vmem, sem
    )
    dma.start()
    a = f1_ref[:, :, :]
    dma.wait()
    inv_c = 1.0 / C
    # per-lane stores: a K*K-way jnp.stack store crashes the Mosaic compiler
    # for K*K=81, so each displacement writes its own output lane
    for iy in range(K):
        for ix in range(K):
            dy = P + (iy - K // 2) * disp_stride
            dx = P + (ix - K // 2) * disp_stride
            b = f2_vmem[dy : dy + TH, dx : dx + W, :]
            out_ref[:, :, iy * K + ix] = jnp.sum(a * b, axis=-1) * inv_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def correlation_pallas(
    f1: jax.Array,
    f2: jax.Array,
    max_disp: int,
    disp_stride: int = 1,
    out_stride: int = 1,
) -> jax.Array:
    return _forward(f1, f2, max_disp, disp_stride, out_stride)


def _forward(f1, f2, max_disp, disp_stride, out_stride):
    assert out_stride == 1
    H, W, C = f1.shape
    D = max_disp // disp_stride
    K = 2 * D + 1
    P = max_disp
    # lane-align channels (extra lanes are zero: sums unchanged; the
    # normalization below uses the true C)
    Cp = ((C + 127) // 128) * 128
    if Cp != C:
        f1 = jnp.pad(f1, ((0, 0), (0, 0), (0, Cp - C)))
        f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, Cp - C)))
    # sublane-align the padded width
    Wp2 = ((W + 2 * P + 7) // 8) * 8
    f2p = jnp.pad(f2, ((P, P), (P, Wp2 - W - P), (0, 0)))

    Hp = ((H + _TH - 1) // _TH) * _TH
    if Hp != H:
        f1 = jnp.pad(f1, ((0, Hp - H), (0, 0), (0, 0)))
        f2p = jnp.pad(f2p, ((0, Hp - H), (0, 0), (0, 0)))

    kernel = functools.partial(
        _corr_kernel, K=K, disp_stride=disp_stride, P=P, C=C, W=W
    )
    out = pl.pallas_call(
        kernel,
        grid=(Hp // _TH,),
        in_specs=[
            pl.BlockSpec((_TH, W, Cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_TH, W, K * K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, W, K * K), f1.dtype),
        scratch_shapes=[
            pltpu.VMEM((_TH + 2 * P, Wp2, Cp), f1.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=not _on_tpu(),
    )(f1, f2p)
    return out[:H]


def _fwd(f1, f2, max_disp, disp_stride, out_stride):
    return _forward(f1, f2, max_disp, disp_stride, out_stride), (f1, f2)


def _bwd(max_disp, disp_stride, out_stride, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(
        lambda a, b: correlation_lax(a, b, max_disp, disp_stride, out_stride), f1, f2
    )
    return vjp(g)


correlation_pallas.defvjp(_fwd, _bwd)
