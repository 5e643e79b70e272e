"""Fused inference ResNet stages: identity bottleneck blocks in one Pallas kernel.

STATUS: correct, parity-tested, and — measured on the real v5e — NOT faster
than XLA's convolutions. Kept as an opt-in experimental path
(``ExtractConfig`` keeps the Flax/XLA forward as the default); the
measurements below are the honest disposition of SURVEY.md's N6 "Pallas
conv kernels (stretch)" line.

Measurements (v5e chip, ResNet-50 shapes, batch 128, marginal-chain timing):

- layer2 identity blocks (C=512, M=128): XLA 1.10 ms = 152 TFLOP/s (77%
  MFU). This kernel: 1.35 ms. Its matmul pipeline alone reaches 194
  TFLOP/s (98% MFU — ``noroll`` variant), but the 8 sublane-unaligned
  rolls that implement the 3x3 taps cost 0.44 ms and erase the win.
- layer1 identity blocks (C=256, M=64): XLA 1.72 ms = 65 TFLOP/s — which
  IS the structural MXU ceiling for these shapes: the bottleneck width
  M=64 makes every conv2 matmul K=64/N=64 (a 128x128 systolic array runs
  those at <=25% peak), so ~32% MFU is the shape-imposed speed of light
  and XLA already sits on it. No scheduling, fusion, or HBM-traffic
  optimization can beat it without changing the matmul shapes themselves.
- The "HBM-bound early stages" hypothesis from coarse stage timing was
  wrong: XLA fuses BN/relu/residual into its convs, and per-stage
  truncation deltas carry +/-0.5 ms noise on this chip.

Original rationale (kept for context): run ALL stride-1 ("identity")
bottleneck blocks of a stage for one image entirely in VMEM, so HBM sees
exactly one read of the stage input and one write of the stage output,
instead of ~6 tensor passes per block.

TPU mapping (SURVEY.md N6; the stretch conv kernel, now measured-justified):
- activations flattened to [H*W, C]: lane dim = channels (128-multiple for
  layers 2-4), sublane dim = pixels — MXU-ready without relayout.
- 1x1 convs ARE matmuls: [HW, C] @ [C, M] on the MXU, f32 accumulation.
- the 3x3 conv is 9 shifted matmuls: for tap (dy, dx), roll the flattened
  rows by dy*W+dx, zero the rows whose source pixel falls outside the
  image (mask from iota-derived (h, w)), and accumulate
  rolled @ W2[tap] into f32. No im2col, no halo exchange — the whole
  feature map is VMEM-resident.
- BatchNorm is folded into the conv weights at trace time (inference:
  scale = gamma/sqrt(var+eps) into the kernel's output channels, bias
  carried separately in f32), so BN costs zero memory passes.
- grid = batch: one image per program instance; Pallas double-buffers the
  per-image input/output DMA behind compute. Weights use a constant
  index_map, so they are fetched into VMEM once and stay resident.

Stem, stride-2 block0s (which change H,W,C) and any stage whose per-block
weights exceed the VMEM group budget stay in plain XLA (lax convs with the
same folded-BN math) — see ``fused_resnet_apply``.

Parity: ``tests/kernels/test_fused_resnet.py`` (interpret mode vs the Flax
``models.resnet`` forward, block- and stage-level).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# BatchNorm folding (inference)
# ---------------------------------------------------------------------------

def fold_bn(kernel: jax.Array, bn_params: dict, bn_stats: dict):
    """Fold an inference BatchNorm into the preceding conv.

    ``conv(x, K) -> BN`` becomes ``conv(x, K * s) + b`` with
    ``s = gamma / sqrt(var + eps)`` (per output channel) and
    ``b = beta - mean * s``. Returns ``(K', b)`` in f32.
    """
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    s = gamma * jax.lax.rsqrt(var + _BN_EPS)
    return kernel.astype(jnp.float32) * s, beta - mean * s


# ---------------------------------------------------------------------------
# The fused identity-blocks kernel
# ---------------------------------------------------------------------------

def _identity_blocks_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                            w3_ref, b3_ref, out_ref, *, H: int, W: int,
                            n_blocks: int):
    """n_blocks stride-1 bottleneck blocks on one [H*W, C] image in VMEM."""
    hw = H * W
    f32 = jnp.float32
    h = x_ref[0]                                       # [HW, C] bf16

    # tap geometry: row r holds pixel (r//W, r%W); tap (dy,dx) reads source
    # (h+dy, w+dx), which must stay inside the image. Masks are built
    # INLINE per tap — a [HW, 1] vector is lane-padded to 128 wide by
    # Mosaic, so 9 precomputed masks would burn ~14 MB of VMEM stack.
    r = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    ww = r - (r // W) * W

    def tap_mask(dy, dx):
        # source row in range: h+dy in [0,H) <=> r in [-dy*W, hw - dy*W)
        # — a pure row-range test, no second [HW, 1] index vector needed
        return ((r >= -dy * W) & (r < hw - dy * W)
                & (ww + dx >= 0) & (ww + dx < W))       # [HW, 1] bool

    for blk in range(n_blocks):
        # 1x1 squeeze: [HW, C] @ [C, M]; keep f32 — Mosaic's rotate only
        # handles 32-bit lanes, so the taps roll in f32 and downcast after
        # masking (the cast is VPU-cheap next to the 9 matmuls)
        y = jnp.dot(h, w1_ref[blk], preferred_element_type=f32)
        y = jnp.maximum(y + b1_ref[blk], 0.0)              # [HW, M] f32

        # 3x3 conv = 9 shifted matmuls accumulated in f32
        acc = jnp.zeros(y.shape, f32)
        for t, (dy, dx) in enumerate(
                (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)):
            s = dy * W + dx
            rolled = pltpu.roll(y, (-s) % hw, axis=0) if s else y
            tap = jnp.where(tap_mask(dy, dx), rolled, 0.0
                            ).astype(jnp.bfloat16)
            acc += jnp.dot(tap, w2_ref[blk, t], preferred_element_type=f32)
        y = jnp.maximum(acc + b2_ref[blk], 0.0).astype(jnp.bfloat16)

        # 1x1 expand + residual + relu; Mosaic requires a 32-bit matmul
        # accumulator, so the dot lands in f32 and is downcast immediately
        # (the residual add runs in bf16, exactly the Flax block's flow)
        y3 = jnp.dot(y, w3_ref[blk], preferred_element_type=f32)
        y3 = (y3 + b3_ref[blk]).astype(jnp.bfloat16)
        h = jnp.maximum(y3 + h, jnp.bfloat16(0))

    out_ref[0] = h


def fused_identity_blocks(x: jax.Array, w1, b1, w2, b2, w3, b3,
                          *, H: int, W: int,
                          interpret: bool = False) -> jax.Array:
    """Run stacked stride-1 bottleneck blocks fused in VMEM.

    x  : [B, H*W, C] bf16
    w1 : [n, C, M] bf16   b1: [n, 1, M] f32   (conv1 + bn1 folded)
    w2 : [n, 9, M, M] bf16 b2: [n, 1, M] f32  (3x3 conv2 taps, row-major dy,dx)
    w3 : [n, M, C] bf16   b3: [n, 1, C] f32   (conv3 + bn3 folded)
    Returns [B, H*W, C] bf16.
    """
    B, hw, C = x.shape
    n, _, M = w1.shape
    assert hw == H * W, (hw, H, W)
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_identity_blocks_kernel, H=H, W=W, n_blocks=n),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, hw, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w1), full(b1), full(w2), full(b2), full(w3), full(b3),
        ],
        out_specs=pl.BlockSpec((1, hw, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        # donate x: in/out have identical [B, HW, C] layout and the kernel
        # reads its input block fully before the final write. (Note: this
        # aliases the HBM buffers only — the layer-1 shape still exceeds
        # the 16 MB scoped-VMEM limit by ~2.3 MB because [HW, 64]-wide f32
        # intermediates lane-pad to 128; hence layer 1 is not in the
        # default fused_layers.)
        input_output_aliases={0: 0},
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)


# ---------------------------------------------------------------------------
# Full folded-BN ResNet forward (stem/block0 in XLA, identity blocks fused)
# ---------------------------------------------------------------------------

def _conv(x, k, stride: int, pad: int):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y


def _block0(h, bp, bs, stride: int):
    """Bottleneck block 0: has a downsample projection (and maybe stride)."""
    k1, c1 = fold_bn(bp["conv1"]["kernel"], bp["bn1"], bs["bn1"])
    y = jnp.maximum(_conv(h, k1, 1, 0) + c1, 0.0).astype(h.dtype)
    k2, c2 = fold_bn(bp["conv2"]["kernel"], bp["bn2"], bs["bn2"])
    y = jnp.maximum(_conv(y, k2, stride, 1) + c2, 0.0).astype(h.dtype)
    k3, c3 = fold_bn(bp["conv3"]["kernel"], bp["bn3"], bs["bn3"])
    y = _conv(y, k3, 1, 0) + c3
    kd, cd = fold_bn(bp["downsample_conv"]["kernel"], bp["downsample_bn"],
                     bs["downsample_bn"])
    r = _conv(h, kd, stride, 0) + cd
    return jnp.maximum(y + r, 0.0).astype(h.dtype)


def _identity_block_lax(h, bp, bs):
    """Reference identity block with the same folded-BN math (XLA path)."""
    k1, c1 = fold_bn(bp["conv1"]["kernel"], bp["bn1"], bs["bn1"])
    y = jnp.maximum(_conv(h, k1, 1, 0) + c1, 0.0).astype(h.dtype)
    k2, c2 = fold_bn(bp["conv2"]["kernel"], bp["bn2"], bs["bn2"])
    y = jnp.maximum(_conv(y, k2, 1, 1) + c2, 0.0).astype(h.dtype)
    k3, c3 = fold_bn(bp["conv3"]["kernel"], bp["bn3"], bs["bn3"])
    y = _conv(y, k3, 1, 0) + c3 + h.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(h.dtype)


def _stack_identity_weights(layer_p, layer_s, blocks):
    """Fold + stack identity-block weights for the kernel. Returns the
    6-tuple of kernel operands for ``blocks`` (a list of block names)."""
    w1, b1, w2, b2, w3, b3 = [], [], [], [], [], []
    for name in blocks:
        bp, bs = layer_p[name], layer_s[name]
        k1, c1 = fold_bn(bp["conv1"]["kernel"], bp["bn1"], bs["bn1"])
        k2, c2 = fold_bn(bp["conv2"]["kernel"], bp["bn2"], bs["bn2"])
        k3, c3 = fold_bn(bp["conv3"]["kernel"], bp["bn3"], bs["bn3"])
        M = k1.shape[-1]
        C = k3.shape[-1]
        w1.append(k1.reshape(-1, M))                   # [C, M] (1x1)
        b1.append(c1.reshape(1, M))
        w2.append(k2.reshape(9, M, M))                 # [3,3,M,M] -> taps
        b2.append(c2.reshape(1, M))
        w3.append(k3.reshape(M, C))
        b3.append(c3.reshape(1, C))
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    return (jnp.stack(w1).astype(bf16), jnp.stack(b1).astype(f32),
            jnp.stack(w2).astype(bf16), jnp.stack(b2).astype(f32),
            jnp.stack(w3).astype(bf16), jnp.stack(b3).astype(f32))


# identity-block weight bytes (bf16): conv1 C*M + conv2 9*M*M + conv3 M*C
def _block_weight_bytes(C: int, M: int) -> int:
    return 2 * (C * M + 9 * M * M + M * C)


def fused_resnet_apply(variables: dict, x: jax.Array,
                       stage_sizes=(3, 4, 6, 3), *,
                       use_kernel: bool = True,
                       fused_layers=(2,),
                       interpret: bool = False,
                       max_group_bytes: int = 6 << 20) -> jax.Array:
    """Inference ResNet (Bottleneck) forward with folded BN and fused
    identity blocks. Mirrors ``models.resnet.ResNet.__call__``
    (torchvision layout, NHWC/HWIO) but is a pure function of the SAME
    Flax ``variables`` — training and torch weight import stay on the Flax
    module; this is the TPU serving path.

    Identity blocks are grouped so one kernel call's weights stay under
    ``max_group_bytes`` of VMEM (layer4's 8.8 MB blocks run one per call;
    a group never splits below a single block). ``fused_layers`` selects
    which stages (1-based) route identity blocks through the Pallas
    kernel; the rest use the same folded-BN math via XLA convs. Default
    is (2,) — the only stage where the kernel both fits VMEM and comes
    close to XLA (see module docstring for why XLA wins on v5e).
    """
    p, bs = variables["params"], variables["batch_stats"]
    dt = jnp.bfloat16
    h = x.astype(dt)
    k0, c0 = fold_bn(p["conv1"]["kernel"], p["bn1"], bs["bn1"])
    h = jnp.maximum(_conv(h, k0, 2, 3) + c0, 0.0).astype(dt)
    h = jax.lax.reduce_window(
        h, jnp.asarray(-jnp.inf, dt), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])

    for i, blocks in enumerate(stage_sizes):
        lp, ls = p[f"layer{i + 1}"], bs[f"layer{i + 1}"]
        h = _block0(h, lp["0"], ls["0"], stride=1 if i == 0 else 2)
        names = [str(j) for j in range(1, blocks)]
        if not names:
            continue
        if not use_kernel or (i + 1) not in fused_layers:
            for name in names:
                h = _identity_block_lax(h, lp[name], ls[name])
            continue
        B, H, W, C = h.shape
        M = C // 4
        per_block = _block_weight_bytes(C, M)
        group = max(1, max_group_bytes // per_block)
        h2 = h.reshape(B, H * W, C)
        for g in range(0, len(names), group):
            ops = _stack_identity_weights(lp, ls, names[g:g + group])
            h2 = fused_identity_blocks(h2, *ops, H=H, W=W,
                                       interpret=interpret)
        h = h2.reshape(B, H, W, C)
    return h


STAGE_SIZES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}
