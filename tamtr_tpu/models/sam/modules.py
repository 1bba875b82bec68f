"""Segment Anything Model (SAM) modules, TPU-native flax/NHWC.

Re-designed equivalents of the reference SAM stack
(`ultralytics/models/sam/modules/{encoders,decoders,transformer,tiny_encoder,sam}.py`):

- `ImageEncoderViT`  — ViTDet-style encoder with windowed + global attention
  and decomposed relative position bias (reference `encoders.py:13-125`).
- `TinyViTEncoder`   — MobileSAM's TinyViT hierarchical encoder
  (reference `tiny_encoder.py:517-721`).
- `PromptEncoder`    — point/box/mask prompts -> sparse + dense embeddings
  (reference `encoders.py:128-290`).
- `MaskDecoder`      — two-way transformer + hypernetwork mask heads
  (reference `decoders.py:12-149`, `transformer.py:12-273`).

TPU-first notes:
- NHWC everywhere (XLA's native TPU conv layout); the token path is (B, N, C).
- All shapes are static: window partitioning pads to fixed multiples at trace
  time, prompt counts are padded by the predictor, and the "optional prompt"
  combinations are Python-static so each combination compiles once.
- Attention is plain `jnp.einsum` -> softmax -> einsum; XLA fuses the scale
  and bias adds. Sequence lengths (<=4096 image tokens, ~200-token windows)
  are far below the regime where a custom flash kernel wins on TPU.
- Relative-position tables and TinyViT attention-bias index maps are computed
  with numpy at trace time (static) and baked into the compiled program.
"""

from __future__ import annotations

import itertools
import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


class MLPBlock(nn.Module):
    """Linear -> act -> Linear (reference `nn/modules/transformer.py:MLPBlock`)."""

    mlp_dim: int
    out_dim: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
        return nn.Dense(self.out_dim, name="lin2")(x)


class MLP(nn.Module):
    """N-layer ReLU MLP (reference `sam/modules/decoders.py:152-188`)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        x = nn.Dense(self.output_dim, name=f"layers_{self.num_layers - 1}")(x)
        return nn.sigmoid(x) if self.sigmoid_output else x


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NHWC features (reference `LayerNorm2d`, eps 1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.eps)(x)


def window_partition(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B,H,W,C) -> (B*nW, ws, ws, C) with zero pad (reference `encoders.py:458`)."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(
    w: jnp.ndarray, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of `window_partition` (reference `encoders.py:482`)."""
    Hp, Wp = pad_hw
    H, W = hw
    B = w.shape[0] // (Hp * Wp // ws // ws)
    x = w.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _rel_pos_table(q_size: int, k_size: int) -> np.ndarray:
    """Static index table into a (2*max(q,k)-1, C) rel-pos param.

    Reference `encoders.py:507-537` (`get_rel_pos`); sizes are static under
    jit so the gather indices are plain numpy.
    """
    q = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    return ((q - k) + (k_size - 1) * max(q_size / k_size, 1.0)).astype(np.int64)


class ViTAttention(nn.Module):
    """MHSA with optional decomposed relative position bias.

    Reference `sam/modules/encoders.py:402-455` + `add_decomposed_rel_pos`
    (`encoders.py:540-576`). Operates on (B, H, W, C) windows/maps.
    """

    num_heads: int
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, N, hd)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q * (hd ** -0.5), k)
        if self.use_rel_pos:
            assert self.input_size is not None
            rp_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd))
            rp_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd))
            Rh = rp_h[_rel_pos_table(H, H)]  # (H, H, hd)
            Rw = rp_w[_rel_pos_table(W, W)]  # (W, W, hd)
            r_q = q.reshape(B, self.num_heads, H, W, hd)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(B, self.num_heads, H * W, H * W)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(out)


class ViTBlock(nn.Module):
    """Transformer block with optional window attention (reference `encoders.py:337-399`)."""

    num_heads: int
    mlp_ratio: float = 4.0
    use_rel_pos: bool = False
    window_size: int = 0
    input_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        attn_size = (
            (self.window_size, self.window_size) if self.window_size > 0 else self.input_size
        )
        x = ViTAttention(
            self.num_heads, use_rel_pos=self.use_rel_pos, input_size=attn_size, name="attn"
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MLPBlock(int(C * self.mlp_ratio), C, name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """ViTDet image encoder: patchify -> ViT blocks -> conv neck.

    Reference `sam/modules/encoders.py:13-125`. Input (B, H, W, 3) NHWC,
    output (B, H/16, W/16, out_chans).
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Sequence[int] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID", name="patch_embed")(x)
        gs = self.img_size // p
        if self.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros, (1, gs, gs, self.embed_dim))
            x = x + pos
        for i in range(self.depth):
            x = ViTBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                use_rel_pos=self.use_rel_pos,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=(gs, gs),
                name=f"blocks_{i}",
            )(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="neck_conv2")(x)
        return LayerNorm2d(name="neck_ln2")(x)


# ---------------------------------------------------------------------------
# TinyViT (MobileSAM encoder)
# ---------------------------------------------------------------------------


class ConvBN2d(nn.Module):
    """Conv (no bias) + BatchNorm, the TinyViT `Conv2d_BN` (reference `tiny_encoder.py:23`)."""

    features: int
    k: int = 1
    s: int = 1
    p: int = 0
    groups: int = 1
    bn_weight_init: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(self.p, self.p), (self.p, self.p)],
            feature_group_count=self.groups,
            use_bias=False,
            name="c",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.constant(self.bn_weight_init),
            name="bn",
        )(x)


class MBConv(nn.Module):
    """Mobile inverted bottleneck (reference `tiny_encoder.py:63-98`)."""

    out_chans: int
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(x.shape[-1] * self.expand_ratio)
        shortcut = x
        x = nn.gelu(ConvBN2d(hidden, name="conv1")(x, train), approximate=False)
        x = nn.gelu(
            ConvBN2d(hidden, k=3, s=1, p=1, groups=hidden, name="conv2")(x, train),
            approximate=False,
        )
        x = ConvBN2d(self.out_chans, bn_weight_init=0.0, name="conv3")(x, train)
        return nn.gelu(x + shortcut, approximate=False)


class PatchMerging(nn.Module):
    """Downsample + project between TinyViT stages (reference `tiny_encoder.py:101-133`).

    The reference hardcodes stride 1 when `out_dim in (320, 448, 576)` —
    i.e. the merge into the FINAL stage keeps resolution. We take the stride
    explicitly; the encoder passes 1 for the last merge.
    """

    out_dim: int
    stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stride = self.stride
        x = nn.gelu(ConvBN2d(self.out_dim, name="conv1")(x, train), approximate=False)
        x = nn.gelu(
            ConvBN2d(self.out_dim, k=3, s=stride, p=1, groups=self.out_dim, name="conv2")(x, train),
            approximate=False,
        )
        return ConvBN2d(self.out_dim, name="conv3")(x, train)


def _attention_bias_idxs(resolution: Tuple[int, int]) -> Tuple[int, np.ndarray]:
    """Static (N, N) index map into the per-offset attention-bias table.

    Reference `tiny_encoder.py:271-282`.
    """
    points = list(itertools.product(range(resolution[0]), range(resolution[1])))
    offsets: dict = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return len(offsets), np.asarray(idxs, np.int64).reshape(n, n)


class TinyViTAttention(nn.Module):
    """Window MHSA with trained per-offset attention biases (reference `tiny_encoder.py:224-313`)."""

    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        d = int(self.attn_ratio * self.key_dim)
        n_off, idxs = _attention_bias_idxs(self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros, (self.num_heads, n_off))
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(self.num_heads * (2 * self.key_dim + d), name="qkv")(x)
        qkv = qkv.reshape(B, N, self.num_heads, 2 * self.key_dim + d)
        q, k, v = jnp.split(qkv, [self.key_dim, 2 * self.key_dim], axis=-1)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) * (self.key_dim ** -0.5)
        attn = attn + biases[:, idxs]  # (nh, N, N) broadcast over batch
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.num_heads * d)
        return nn.Dense(C, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Window attention + local conv + MLP (reference `tiny_encoder.py:316-414`)."""

    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    local_conv_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws = self.window_size
        res = x
        if H == ws and W == ws:
            a = x.reshape(B, H * W, C)
            a = TinyViTAttention(C // self.num_heads, self.num_heads, 1.0, (ws, ws), name="attn")(a)
            x = a.reshape(B, H, W, C)
        else:
            w, pad_hw = window_partition(x, ws)
            a = w.reshape(-1, ws * ws, C)
            a = TinyViTAttention(C // self.num_heads, self.num_heads, 1.0, (ws, ws), name="attn")(a)
            x = window_unpartition(a.reshape(-1, ws, ws, C), ws, pad_hw, (H, W))
        x = res + x
        pad = self.local_conv_size // 2
        x = ConvBN2d(C, k=self.local_conv_size, s=1, p=pad, groups=C, name="local_conv")(x, train)
        y = x.reshape(B, H * W, C)
        m = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(y)
        m = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1")(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(C, name="mlp_fc2")(m)
        return (y + m).reshape(B, H, W, C)


class TinyViTEncoder(nn.Module):
    """MobileSAM's TinyViT-5M image encoder (reference `tiny_encoder.py:517-721`).

    Input (B, 1024, 1024, 3) -> output (B, 64, 64, 256). Stage 0 is MBConv,
    stages 1-3 are window-attention transformer stages with PatchMerging
    between them (stage-3 merge keeps stride 1, reference :115).
    """

    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    out_chans: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # patch embed: two stride-2 convs (reference :38-60)
        n = self.embed_dims[0]
        x = nn.gelu(ConvBN2d(n // 2, k=3, s=2, p=1, name="patch_embed_conv1")(x, train), approximate=False)
        x = ConvBN2d(n, k=3, s=2, p=1, name="patch_embed_conv2")(x, train)

        # stage 0: MBConv
        for i in range(self.depths[0]):
            x = MBConv(self.embed_dims[0], self.mbconv_expand_ratio, name=f"layer0_block{i}")(x, train)
        n_stages = len(self.depths)
        x = PatchMerging(
            self.embed_dims[1], stride=1 if n_stages == 2 else 2, name="layer0_downsample"
        )(x, train)

        # stages 1..3: transformer
        for s in range(1, len(self.depths)):
            for i in range(self.depths[s]):
                x = TinyViTBlock(
                    num_heads=self.num_heads[s],
                    window_size=self.window_sizes[s],
                    mlp_ratio=self.mlp_ratio,
                    local_conv_size=self.local_conv_size,
                    name=f"layer{s}_block{i}",
                )(x, train)
            if s < n_stages - 1:
                # final merge keeps stride 1 (reference `tiny_encoder.py:115`)
                x = PatchMerging(
                    self.embed_dims[s + 1],
                    stride=1 if s == n_stages - 2 else 2,
                    name=f"layer{s}_downsample",
                )(x, train)

        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="neck_conv2")(x)
        return LayerNorm2d(name="neck_ln2")(x)


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier position encoding (reference `encoders.py:293-334`).

    The gaussian projection matrix is a checkpointed (2, C/2) parameter.
    """

    num_pos_feats: int = 64

    def setup(self):
        self.gaussian = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(stddev=1.0),
            (2, self.num_pos_feats),
        )

    def _encode(self, coords: jnp.ndarray) -> jnp.ndarray:
        coords = 2.0 * coords - 1.0
        coords = (2.0 * np.pi) * (coords @ self.gaussian)
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def grid(self, h: int, w: int) -> jnp.ndarray:
        """Dense PE for an (h, w) grid -> (h, w, C)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2) as (x, y)
        return self._encode(grid)

    def with_coords(self, coords: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
        """PE for pixel coords (..., 2) as (x, y) -> (..., C)."""
        scaled = coords / jnp.asarray([image_size[1], image_size[0]], coords.dtype)
        return self._encode(scaled)

    def __call__(self, h: int, w: int) -> jnp.ndarray:
        return self.grid(h, w)


class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> sparse + dense embeddings (reference `encoders.py:128-290`).

    Point labels: 1 foreground, 0 background, -1 padding/not-a-point,
    2 and 3 box corners. Optionality of each prompt kind is Python-static.
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # pos/neg point + 2 box corners (reference :174)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        c = self.mask_in_chans
        self.mask_down1 = nn.Conv(c // 4, (2, 2), strides=(2, 2), name="mask_down1")
        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_down2 = nn.Conv(c, (2, 2), strides=(2, 2), name="mask_down2")
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")
        self.mask_proj = nn.Conv(self.embed_dim, (1, 1), name="mask_proj")

    def get_dense_pe(self) -> jnp.ndarray:
        """(1, H, W, C) positional encoding of the image-embedding grid."""
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)[None]

    def _embed_points(self, points: jnp.ndarray, labels: jnp.ndarray, pad: bool) -> jnp.ndarray:
        points = points + 0.5  # pixel centers (reference :208)
        if pad:
            points = jnp.concatenate([points, jnp.zeros_like(points[:, :1])], axis=1)
            labels = jnp.concatenate([labels, -jnp.ones_like(labels[:, :1])], axis=1)
        pe = self.pe_layer.with_coords(points, self.input_image_size)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, self.not_a_point_embed[0], pe + jnp.where(
            lab == 0, self.point_embeddings[0], self.point_embeddings[1]))
        return pe

    def _embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        corners = (boxes + 0.5).reshape(-1, 2, 2)
        ce = self.pe_layer.with_coords(corners, self.input_image_size)
        return ce + self.point_embeddings[2:4][None]

    def _embed_masks(self, masks: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.gelu(self.mask_ln1(self.mask_down1(masks)), approximate=False)
        x = nn.gelu(self.mask_ln2(self.mask_down2(x)), approximate=False)
        return self.mask_proj(x)

    def __call__(
        self,
        points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        boxes: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse (B, N, C), dense (B, h, w, C)) embeddings.

        points: ((B, P, 2) xy pixel coords, (B, P) labels); boxes: (B, 4) xyxy;
        masks: (B, 4h, 4w, 1) low-res mask logits.
        """
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1
        sparse = jnp.zeros((bs, 0, self.embed_dim), jnp.float32)
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=boxes is None)], axis=1
            )
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self._embed_boxes(boxes)], axis=1)
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1), (bs, h, w, self.embed_dim)
            )
        return sparse, dense


# ---------------------------------------------------------------------------
# Two-way transformer + mask decoder
# ---------------------------------------------------------------------------


class SAMAttention(nn.Module):
    """Attention with optional internal downsampling (reference `transformer.py:204-273`)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        internal = self.embedding_dim // self.downsample_rate
        hd = internal // self.num_heads
        q = nn.Dense(internal, name="q_proj")(q)
        k = nn.Dense(internal, name="k_proj")(k)
        v = nn.Dense(internal, name="v_proj")(v)

        def heads(t):
            b, n, c = t.shape
            return t.reshape(b, n, self.num_heads, c // self.num_heads).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        b, h, n, c = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * c)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Self-attn + bidirectional cross-attn + MLP (reference `transformer.py:115-201`)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = SAMAttention(self.embedding_dim, self.num_heads, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + SAMAttention(self.embedding_dim, self.num_heads, name="self_attn")(
                q, q, queries
            )
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + SAMAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, self.embedding_dim, act="relu", name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + SAMAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Token<->image two-way transformer (reference `transformer.py:12-112`)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, H, W, C); point_embedding: (B, N, C)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = (
            image_pe.reshape(image_pe.shape[0], h * w, c) if image_pe.ndim == 4 else image_pe
        )
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim,
                self.num_heads,
                self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + SAMAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="final_attn_token_to_image",
        )(q, k, keys)
        return nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries), keys


class MaskDecoder(nn.Module):
    """Two-way transformer + hypernetwork mask heads (reference `decoders.py:12-149`).

    Returns (masks (B, num_mask_tokens, 4h, 4w), iou_pred (B, num_mask_tokens));
    the caller slices multimask (1:) vs single (0:1).
    """

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer_depth: int = 2
    transformer_num_heads: int = 8
    transformer_mlp_dim: int = 2048

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,
        image_pe: jnp.ndarray,
        sparse_prompt_embeddings: jnp.ndarray,
        dense_prompt_embeddings: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (num_mask_tokens, self.transformer_dim)
        )
        bs = sparse_prompt_embeddings.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None],
            (bs, 1 + num_mask_tokens, self.transformer_dim),
        )
        tokens = jnp.concatenate([out_tokens, sparse_prompt_embeddings], axis=1)

        # Per-prompt image copies (reference :127): broadcast the (1-image)
        # embedding over the prompt batch and add the dense prompt.
        src = jnp.broadcast_to(image_embeddings, (bs,) + image_embeddings.shape[1:])
        src = src + dense_prompt_embeddings
        b, h, w, c = src.shape

        hs, src = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=self.transformer_dim,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            name="transformer",
        )(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

        # Upscale 4x with two stride-2 transposed convs (reference :60-66).
        x = src.reshape(b, h, w, c)
        x = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2), name="upscale_conv1")(x)
        x = nn.gelu(LayerNorm2d(name="upscale_ln")(x), approximate=False)
        x = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2), name="upscale_conv2")(x)
        upscaled = nn.gelu(x, approximate=False)  # (B, 4h, 4w, C/8)

        hyper_in = jnp.stack(
            [
                MLP(self.transformer_dim, self.transformer_dim // 8, 3, name=f"hyper_mlps_{i}")(
                    mask_tokens_out[:, i]
                )
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B, M, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, upscaled)
        iou_pred = MLP(
            self.iou_head_hidden_dim, num_mask_tokens, self.iou_head_depth, name="iou_prediction_head"
        )(iou_token_out)
        return masks, iou_pred
