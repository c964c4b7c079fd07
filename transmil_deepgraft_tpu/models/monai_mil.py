"""MONAI-style MIL head family ('AttTrans' in the reference configs).

Ref ``code/models/MonaiMILModel.py:11-232`` (vendored MONAI milmodel): modes
``mean`` / ``max`` / ``att`` (tanh attention) / ``att_trans`` (4-block
TransformerEncoder over instance features before attention) /
``att_trans_pyramid`` (per-stage backbone feature pyramid through a cascade of
encoders). The reference wires mode ``att_trans`` for model name 'AttTrans'
(``model_interface.py:127-128``).

Torch-parity details matched exactly: the attention head is
``Linear(nfc, 2048) -> Tanh -> Linear(2048, 1)`` (``MonaiMILModel.py:119``),
the encoders are post-norm ReLU ``nn.TransformerEncoderLayer`` stacks
(:class:`~transmil_deepgraft_tpu.models.layers.TorchEncoderLayer`), and the
pyramid cascade is T0(l1:256) -> T1(cat+l2: 768->256) -> T2(cat+l3: 1280->256)
-> T3(cat+l4: d_model=2304) with nfc = 2048+256 (``MonaiMILModel.py:127-155``).
State dicts convert via ``utils/torch_weights.convert_monai_mil_state_dict``.

The head operates on embedded features; the pyramid variant takes the
per-stage pooled features tuple that ``models/resnet.ResNet`` returns with
``return_pyramid=True`` (the flax answer to the reference's forward hooks on
layer1-4, ``MonaiMILModel.py:72-110``). Pair with ``ImageMILModel`` for the
raw-image path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.layers import TorchTransformerEncoder

PYRAMID_DIMS = (256, 512, 1024, 2048)  # ResNet50 stage output channels


class MonaiMIL(nn.Module):
    n_classes: int
    in_features: int = 2048
    mil_mode: str = "att_trans"
    trans_blocks: int = 4
    trans_dropout: float = 0.0

    def _attention_pool(self, h: jax.Array, deterministic: bool):
        # MONAI: Linear(nfc, 2048) -> Tanh -> Linear(2048, 1)
        a = jnp.tanh(nn.Dense(2048, name="attention_0")(h))
        a = nn.Dense(1, name="attention_1")(a)  # (B, N, 1)
        a = jax.nn.softmax(a, axis=1)
        return jnp.sum(h * a, axis=1), jnp.swapaxes(a, 1, 2)  # (B, nfc), (B, 1, N)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        pyramid: Optional[Sequence[jax.Array]] = None,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        if x.ndim == 2:
            x = x[None]
        h = x.astype(jnp.float32)  # (B, N, D)
        attn = None

        if self.mil_mode == "mean":
            logits = nn.Dense(self.n_classes, name="myfc")(h).mean(axis=1)
        elif self.mil_mode == "max":
            logits = nn.Dense(self.n_classes, name="myfc")(h).max(axis=1)
        elif self.mil_mode in ("att", "att_trans"):
            if self.mil_mode == "att_trans":
                h = TorchTransformerEncoder(
                    d_model=self.in_features, num_layers=self.trans_blocks,
                    nhead=8, dropout=self.trans_dropout, name="transformer",
                )(h, deterministic=deterministic)
            pooled, attn = self._attention_pool(h, deterministic)
            logits = nn.Dense(self.n_classes, name="myfc")(pooled)
        elif self.mil_mode == "att_trans_pyramid":
            if pyramid is None:
                raise ValueError(
                    "att_trans_pyramid needs the backbone feature pyramid "
                    "(ResNet(..., return_pyramid=True) stage features l1..l4)"
                )
            l1, l2, l3, l4 = (p.astype(jnp.float32) for p in pyramid)
            enc = lambda d, name: TorchTransformerEncoder(  # noqa: E731
                d_model=d, num_layers=self.trans_blocks, nhead=8,
                dropout=self.trans_dropout, name=name,
            )
            h = enc(256, "transformer_0")(l1, deterministic=deterministic)
            h = jnp.concatenate([h, l2], axis=-1)  # 768
            h = nn.Dense(256, name="transformer_1_proj")(h)
            h = enc(256, "transformer_1")(h, deterministic=deterministic)
            h = jnp.concatenate([h, l3], axis=-1)  # 1280
            h = nn.Dense(256, name="transformer_2_proj")(h)
            h = enc(256, "transformer_2")(h, deterministic=deterministic)
            h = jnp.concatenate([h, l4], axis=-1)  # 2304
            h = enc(2304, "transformer_3")(h, deterministic=deterministic)
            pooled, attn = self._attention_pool(h, deterministic)
            logits = nn.Dense(self.n_classes, name="myfc")(pooled)
        else:
            raise ValueError(f"unsupported mil_mode '{self.mil_mode}'")

        if return_attn:
            return logits, attn
        return logits
