"""Backbone / neck building blocks, NHWC, flax.linen.

TPU-first re-design of the reference's conv blocks
(`ultralytics/nn/modules/conv.py`, `ultralytics/nn/extra_modules/block.py`):

- NHWC layout throughout (XLA's native TPU conv layout; zero transposes).
- BatchNorm matches the reference's effective configuration after
  `initialize_weights` (eps=1e-3, torch momentum=0.03 -> flax momentum=0.97,
  reference `ultralytics/utils/torch_utils.py:303-313`).
- RepConvN keeps its train-time 3x3+1x1 dual branches (reference
  `extra_modules/block.py:24-125`); a deploy-time fusion helper collapses
  them into a single conv for inference.
- TIAGELAN reproduces the reference's *data path*: the text-attention output
  is computed and discarded upstream (`extra_modules/block.py:185`), so by
  default we skip computing it entirely (identical math, fewer FLOPs). Set
  `wire_text_attn=True` to actually gate features with text attention (a
  documented capability extension).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# BatchNorm configuration matching the reference after initialize_weights().
BN_MOMENTUM = 0.97  # flax convention; torch momentum 0.03
BN_EPS = 1e-3


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-shape padding (reference `nn/modules/conv.py:autopad`)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class ConvBN(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU — the reference's `Conv`."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=x.dtype,
        )(x)
        dt = x.dtype
        # Train: statistics and normalization in fp32 (activations cast back).
        # Eval: compute in the activation dtype — the f32 round-trip around
        # every BN blocked XLA from fusing the affine into the conv epilogue
        # and showed up as ~2.5 ms/step of divide/multiply + cast traffic in
        # the r4 trace (bench_artifacts/r04/NOTES.md). bf16 rounding of the
        # per-channel scale equals what a manual conv+BN weight fold would
        # introduce; f32 models are unchanged (dt == f32).
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=jnp.float32 if train else dt,
        )(x)
        x = x.astype(dt)
        return nn.silu(x) if self.act else x


class DWConvBN(nn.Module):
    """Depthwise Conv + BN + SiLU."""

    c2: int
    k: int = 1
    s: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        g = min(x.shape[-1], self.c2)
        return ConvBN(self.c2, self.k, self.s, g=g, act=self.act)(x, train)


class RepConvN(nn.Module):
    """RepVGG-style block: 3x3 + 1x1 dual branch at train time.

    Reference `extra_modules/block.py:24-125` (no identity BN branch:
    `self.bn = None`). At inference the two branches can be fused into a
    single 3x3 conv, but the unfused form is kept as the parameter layout.
    """

    c2: int
    k: int = 3
    s: int = 1
    act: bool = True
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.k == 3
        if self.deploy:
            # single fused conv (reference `switch_to_deploy`, block.py:103-126);
            # params produced by `tamtr_tpu.nn.fuse.fuse_repconv_variables`
            y = nn.Conv(
                self.c2, (3, 3), strides=(self.s, self.s),
                padding=[(1, 1), (1, 1)], use_bias=True, name="fused",
                dtype=x.dtype,  # without this, f32 params promote the whole
                # conv to f32 and the fused model LOSES to the unfused one in
                # bf16 (measured 57.7 vs 42.6 ms/step eval b4)
            )(x)
            return nn.silu(y) if self.act else y
        y1 = ConvBN(self.c2, 3, self.s, p=1, act=False, name="conv1")(x, train)
        y2 = ConvBN(self.c2, 1, self.s, p=0, act=False, name="conv2")(x, train)
        y = y1 + y2
        return nn.silu(y) if self.act else y


class RepNBottleneck(nn.Module):
    """RepConvN -> Conv 3x3 with optional residual (`block.py:126-136`)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y = RepConvN(c_, 3, 1, deploy=self.deploy, name="cv1")(x, train)
        y = ConvBN(self.c2, 3, 1, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class RepNCSP(nn.Module):
    """CSP bottleneck with RepN blocks (`block.py:138-149`)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            y1 = RepNBottleneck(
                c_, self.shortcut, e=1.0, deploy=self.deploy, name=f"m{i}"
            )(y1, train)
        y2 = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class RepNCSPELAN4(nn.Module):
    """YOLOv9 CSP-ELAN block (`block.py:151-169`)."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBN(self.c3, 1, 1, name="cv1")(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y3 = RepNCSP(self.c4, self.n, deploy=self.deploy, name="cv2_csp")(y2, train)
        y3 = ConvBN(self.c4, 3, 1, name="cv2_conv")(y3, train)
        y4 = RepNCSP(self.c4, self.n, deploy=self.deploy, name="cv3_csp")(y3, train)
        y4 = ConvBN(self.c4, 3, 1, name="cv3_conv")(y4, train)
        return ConvBN(self.c2, 1, 1, name="cv4")(jnp.concatenate([y1, y2, y3, y4], axis=-1), train)


class MaxSigmoidAttnBlock(nn.Module):
    """YOLO-World-style max-sigmoid region-text attention (`block.py:194-226`).

    guide: (B, K, gc) text embeddings. Produces a per-head sigmoid gate from
    the max text similarity and applies it to 3x3-projected features.
    """

    c2: int
    nh: int = 1
    ec: int = 128
    scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c1 = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, name="gl")(guide)  # (B, K, ec)
        g = g.reshape(b, -1, self.nh, self.ec // self.nh)  # (B, K, nh, hc_e)
        embed = x if c1 == self.ec else ConvBN(self.ec, 1, act=False, name="ec")(x, train)
        embed = embed.reshape(b, h, w, self.nh, self.ec // self.nh)
        # similarity over text tokens; max over K
        aw = jnp.einsum("bhwmc,bnmc->bmhwn", embed, g)
        aw = aw.max(axis=-1) / (hc**0.5)  # (B, nh, h, w)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw + bias[None, :, None, None])
        if self.scale:
            aw = aw * self.param("scale", nn.initializers.ones, (1, self.nh, 1, 1))
        y = ConvBN(self.c2, 3, 1, act=False, name="proj_conv")(x, train)
        y = y.reshape(b, h, w, self.nh, hc) * aw.transpose(0, 2, 3, 1)[..., None]
        return y.reshape(b, h, w, self.c2)


class TIAGELAN(nn.Module):
    """Text-image attention GELAN (`block.py:171-192`).

    The reference computes `self.attn(y[-3], guide)` and discards the result,
    so its data path is exactly RepNCSPELAN4. We reproduce that: by default
    the attention is not computed at all (same math, fewer FLOPs; the attn
    params still exist for checkpoint parity). `wire_text_attn=True` replaces
    the y[-3] branch with the attention output (capability extension).
    """

    c2: int
    c3: int
    c4: int
    n: int = 1
    nh: int = 8
    wire_text_attn: bool = False
    keep_attn_params: bool = True
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBN(self.c3, 1, 1, name="cv1")(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y3 = RepNCSP(self.c4, self.n, deploy=self.deploy, name="cv2_csp")(y2, train)
        y3 = ConvBN(self.c4, 3, 1, name="cv2_conv")(y3, train)
        y4 = RepNCSP(self.c4, self.n, deploy=self.deploy, name="cv3_csp")(y3, train)
        y4 = ConvBN(self.c4, 3, 1, name="cv3_conv")(y4, train)
        if self.wire_text_attn:
            y2 = MaxSigmoidAttnBlock(self.c4, nh=self.nh, ec=self.c4, name="attn")(y2, guide, train)
        elif self.keep_attn_params:
            # keep parameters registered (parity with reference checkpoints)
            # without paying the compute; lazy-init with a zero-cost call on a
            # stop-gradiented 1x1 slice would still trace conv work, so we
            # register the attn module unconditionally during init only.
            if self.is_initializing():
                _ = MaxSigmoidAttnBlock(self.c4, nh=self.nh, ec=self.c4, name="attn")(
                    y2, guide, train
                )
        return ConvBN(self.c2, 1, 1, name="cv4")(jnp.concatenate([y1, y2, y3, y4], axis=-1), train)


def max_pool_same(x: jnp.ndarray, k: int, s: int = 1) -> jnp.ndarray:
    """MaxPool2d(k, s, padding=k//2) (torch semantics, NHWC)."""
    p = k // 2
    return nn.max_pool(
        x, window_shape=(k, k), strides=(s, s), padding=[(p, p), (p, p)]
    )


class SPPELAN(nn.Module):
    """Spatial pyramid pooling ELAN: 3 cascaded k5 maxpools (`block.py:255-269`)."""

    c2: int
    c3: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = [ConvBN(self.c3, 1, 1, name="cv1")(x, train)]
        for _ in range(3):
            y.append(max_pool_same(y[-1], 5, 1))
        return ConvBN(self.c2, 1, 1, name="cv5")(jnp.concatenate(y, axis=-1), train)


class ADown(nn.Module):
    """YOLOv9 attention-downsample (`block.py:228-241`)."""

    c2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.c2 // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID", count_include_pad=False)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = ConvBN(c, 3, 2, p=1, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x2 = ConvBN(c, 1, 1, p=0, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class CPAM(nn.Module):
    """Channel/spatial pyramid attention module (`block.py:271-308`).

    Channel branch: maxpool(k3,s2) -> bilinear x2 upsample -> sigmoid gate.
    Spatial branch: per-8-chunk max-over-channel sigmoid gate.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        m = max_pool_same(x, 3, 2)
        m = jax.image.resize(m, (b, m.shape[1] * 2, m.shape[2] * 2, c), method="bilinear")
        # guard odd sizes: crop/pad to input (reference assumes even H/W)
        m = m[:, :h, :w, :]
        gate = jax.nn.sigmoid(m)
        cx = gate * x
        chunks = jnp.split(cx, 8, axis=-1)
        outs = [jax.nn.sigmoid(si.max(axis=-1, keepdims=True)) * si for si in chunks]
        return jnp.concatenate(outs, axis=-1)


class AIFI(nn.Module):
    """Intra-scale feature interaction: one transformer encoder layer with a
    2-D sin-cos positional embedding (reference `AIFI`,
    `nn/modules/transformer.py:74-104`; encoder layer `:18-72`, post-norm,
    GELU FFN). Applied to the deepest feature map in RT-DETR.
    """

    cm: int = 2048
    num_heads: int = 8

    @staticmethod
    def sincos_2d(w: int, h: int, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
        """(1, w*h, dim) — replicates the reference's (w, h) 'ij' meshgrid
        flatten order exactly (transformer.py:89-104)."""
        import numpy as np

        assert dim % 4 == 0, "AIFI embed dim must be divisible by 4"
        gw, gh = np.meshgrid(
            np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij"
        )
        pos_dim = dim // 4
        omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
        out_w = gw.reshape(-1)[:, None] * omega[None]
        out_h = gh.reshape(-1)[:, None] * omega[None]
        pos = np.concatenate(
            [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
        )
        return jnp.asarray(pos[None], jnp.float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        nh = self.num_heads
        d = C // nh
        tokens = x.reshape(B, H * W, C)  # h-major, matches torch flatten(2)
        pos = self.sincos_2d(W, H, C).astype(tokens.dtype)
        q = k = tokens + pos
        qp = nn.Dense(C, name="q_proj")(q).reshape(B, -1, nh, d)
        kp = nn.Dense(C, name="k_proj")(k).reshape(B, -1, nh, d)
        vp = nn.Dense(C, name="v_proj")(tokens).reshape(B, -1, nh, d)
        import math as _math

        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / _math.sqrt(d), axis=-1
        )
        sa = jnp.einsum("bhqk,bkhd->bqhd", att, vp).reshape(B, -1, C)
        sa = nn.Dense(C, name="out_proj")(sa)
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm1")(tokens + sa)
        ff = nn.Dense(self.cm, name="fc1")(tokens)
        ff = nn.Dense(C, name="fc2")(nn.gelu(ff))
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm2")(tokens + ff)
        return tokens.reshape(B, H, W, C)


class Upsample(nn.Module):
    """torch `nn.Upsample(scale_factor=s, mode='nearest')` for s in {2, 0.5}."""

    scale: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.scale >= 1:
            s = int(self.scale)
            x = jnp.repeat(x, s, axis=1)
            return jnp.repeat(x, s, axis=2)
        # nearest downsample: output[i] = input[floor(i / scale)] = input[2i]
        s = int(round(1.0 / self.scale))
        return x[:, ::s, ::s, :]


class Concat(nn.Module):
    """Channel concat of a list of feature maps."""

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        return jnp.concatenate(list(xs), axis=-1)


class Silence(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return x


class CBLinear(nn.Module):
    """YOLOv9 auxiliary-branch projection (reference
    `extra_modules/block.py:316-324`): one biased conv producing
    sum(c2s) channels, split into a tuple of per-branch maps."""

    c2s: Tuple[int, ...]
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        pad = autopad(self.k)
        out = nn.Conv(
            features=int(sum(self.c2s)),
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            use_bias=True,
            dtype=x.dtype,
            name="conv",
        )(x)
        splits, acc = [], 0
        for c in self.c2s[:-1]:
            acc += int(c)
            splits.append(acc)
        return tuple(jnp.split(out, splits, axis=-1))


class CBFuse(nn.Module):
    """YOLOv9 cross-branch fuse (reference `extra_modules/block.py:326-338`):
    pick entry idx[i] from each earlier CBLinear tuple, nearest-resize to
    the LAST input's spatial size, and sum everything."""

    idx: Tuple[int, ...]

    @nn.compact
    def __call__(self, xs, train: bool = False) -> jnp.ndarray:
        last = xs[-1]
        th, tw = last.shape[1], last.shape[2]
        out = last
        for i, x in enumerate(xs[:-1]):
            xi = x[self.idx[i]]
            xi = jax.image.resize(
                xi, (xi.shape[0], th, tw, xi.shape[-1]), method="nearest"
            )
            out = out + xi.astype(last.dtype)
        return out


class MLP(nn.Module):
    """Simple ReLU MLP (the reference `nn/modules/transformer.py:MLP`).

    `last_zero=True` zero-initializes the final layer (the reference's
    bbox-head init, `head.py:1275-1281`).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    last_zero: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, d in enumerate(dims):
            last = i == self.num_layers - 1
            kinit = nn.initializers.zeros if (last and self.last_zero) else nn.initializers.lecun_normal()
            x = nn.Dense(d, name=f"layers{i}", kernel_init=kinit)(x)
            if not last:
                x = nn.relu(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth over the batch dim (timm DropPath equivalent)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask / keep
