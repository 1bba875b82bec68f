"""SAM model builders (reference `ultralytics/models/sam/build.py`).

A `SamModel` bundles the three flax modules (image encoder, prompt encoder,
mask decoder) with their variables and normalization constants — the
functional-JAX equivalent of the reference's `Sam(nn.Module)` container
(`sam/modules/sam.py:18-64`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tamtr_tpu.models.sam.modules import (
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
    TinyViTEncoder,
)

PIXEL_MEAN = (123.675, 116.28, 103.53)  # reference `build.py:127`
PIXEL_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass
class SamModel:
    """Image encoder + prompt encoder + mask decoder with their variables."""

    image_encoder: Any
    prompt_encoder: PromptEncoder
    mask_decoder: MaskDecoder
    img_size: int = 1024
    mask_threshold: float = 0.0
    variables: Optional[Dict[str, Any]] = None

    @property
    def embed_size(self) -> Tuple[int, int]:
        return self.prompt_encoder.image_embedding_size

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        """Initialize all three modules' variables (jit-wrapped: the eager
        path would run the full encoder through the device tunnel)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        s = self.img_size
        eh, ew = self.embed_size
        d = self.prompt_encoder.embed_dim

        def _init():
            enc = self.image_encoder.init(r1, jnp.zeros((1, s, s, 3), jnp.float32))
            # exercise every prompt kind so all prompt-encoder params exist
            pe = self.prompt_encoder.init(
                r2,
                points=(jnp.zeros((1, 1, 2), jnp.float32), jnp.zeros((1, 1), jnp.int32)),
                boxes=jnp.zeros((1, 4), jnp.float32),
                masks=jnp.zeros((1, 4 * eh, 4 * ew, 1), jnp.float32),
            )
            dec = self.mask_decoder.init(
                r3,
                jnp.zeros((1, eh, ew, d), jnp.float32),
                jnp.zeros((1, eh, ew, d), jnp.float32),
                jnp.zeros((1, 2, d), jnp.float32),
                jnp.zeros((1, eh, ew, d), jnp.float32),
            )
            return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": dec}

        self.variables = jax.jit(_init)()
        return self.variables

    def load(self, path: str) -> "SamModel":
        """Load variables from an .npz/.msgpack checkpoint of ported weights."""
        import pickle
        from pathlib import Path

        p = Path(path)
        if p.suffix == ".npz":
            flat = dict(np.load(p, allow_pickle=False))
            from flax.traverse_util import unflatten_dict

            self.variables = unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
        else:
            with open(p, "rb") as f:
                self.variables = pickle.load(f)
        return self


def _build_sam(
    encoder_embed_dim,
    encoder_depth,
    encoder_num_heads,
    encoder_global_attn_indexes,
    mobile_sam: bool = False,
    img_size: int = 1024,
    checkpoint: Optional[str] = None,
) -> SamModel:
    """Assemble a SAM (reference `build.py:67-138`); hd=256, 1024px, patch 16."""
    prompt_embed_dim = 256
    vit_patch_size = 16
    embed_size = img_size // vit_patch_size
    if mobile_sam:
        image_encoder = TinyViTEncoder(
            embed_dims=tuple(encoder_embed_dim),
            depths=tuple(encoder_depth),
            num_heads=tuple(encoder_num_heads),
            window_sizes=(7, 7, 14, 7),
            out_chans=prompt_embed_dim,
        )
    else:
        image_encoder = ImageEncoderViT(
            img_size=img_size,
            patch_size=vit_patch_size,
            embed_dim=encoder_embed_dim,
            depth=encoder_depth,
            num_heads=encoder_num_heads,
            out_chans=prompt_embed_dim,
            use_rel_pos=True,
            window_size=14,
            global_attn_indexes=tuple(encoder_global_attn_indexes or ()),
        )
    sam = SamModel(
        image_encoder=image_encoder,
        prompt_encoder=PromptEncoder(
            embed_dim=prompt_embed_dim,
            image_embedding_size=(embed_size, embed_size),
            input_image_size=(img_size, img_size),
            mask_in_chans=16,
        ),
        mask_decoder=MaskDecoder(
            transformer_dim=prompt_embed_dim,
            num_multimask_outputs=3,
            iou_head_depth=3,
            iou_head_hidden_dim=256,
        ),
        img_size=img_size,
    )
    if checkpoint is not None:
        sam.load(checkpoint)
    return sam


def build_sam_vit_h(checkpoint=None) -> SamModel:
    """SAM ViT-H (reference `build.py:22-30`)."""
    return _build_sam(1280, 32, 16, [7, 15, 23, 31], checkpoint=checkpoint)


def build_sam_vit_l(checkpoint=None) -> SamModel:
    """SAM ViT-L (reference `build.py:33-41`)."""
    return _build_sam(1024, 24, 16, [5, 11, 17, 23], checkpoint=checkpoint)


def build_sam_vit_b(checkpoint=None) -> SamModel:
    """SAM ViT-B (reference `build.py:44-52`)."""
    return _build_sam(768, 12, 12, [2, 5, 8, 11], checkpoint=checkpoint)


def build_mobile_sam(checkpoint=None) -> SamModel:
    """MobileSAM / TinyViT-5M (reference `build.py:55-64`)."""
    return _build_sam(
        [64, 128, 160, 320], [2, 2, 6, 2], [2, 4, 5, 10], None, mobile_sam=True,
        checkpoint=checkpoint,
    )


def build_sam_tiny_test(img_size: int = 64) -> SamModel:
    """Miniature SAM for tests/CI: 2-block dim-32 ViT at a small image size."""
    return _build_sam(32, 2, 2, [1], img_size=img_size)


sam_model_map = {
    "sam_h": build_sam_vit_h,
    "sam_l": build_sam_vit_l,
    "sam_b": build_sam_vit_b,
    "mobile_sam": build_mobile_sam,
}


def build_sam(model: str = "sam_b") -> SamModel:
    """Build a SAM by name; accepts reference-style 'sam_b.pt' names too."""
    stem = str(model)
    for suffix in (".pt", ".npz", ".msgpack"):
        if stem.endswith(suffix):
            stem = stem[: -len(suffix)]
    for key, builder in sam_model_map.items():
        if stem.endswith(key):
            return builder()
    raise FileNotFoundError(
        f"{model} is not a supported SAM model. Available: {list(sam_model_map)}"
    )
