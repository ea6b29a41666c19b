"""CCT — Compact Convolutional Transformer
(parity target: reference cct.py:307-345; factories cct.py:16-61).

Conv tokenizer (n × [Conv-ReLU-MaxPool], reference cct.py:176-215) with the
sequence length computed *analytically* instead of the reference's dummy
forward probe (cct.py:204-209, SURVEY.md §3.6); transformer encoder with
per-layer linearly spaced stochastic-depth (cct.py:74-103,259) and sequence
pooling instead of a CLS token (cct.py:293-299).

Divergences (SURVEY.md §8.6):
* 'sine' positional embedding — the reference's default — crashes upstream
  (sliced assignment on a tf tensor, cct.py:271-272); here it works, built
  as a fixed non-trainable table.
* unknown kwargs: the reference silently swallows anything (cct.py:230,317);
  here only the documented legacy names (``padding``, ``pooling_padding``,
  ``mlp_radio``) are accepted-and-ignored with a warning — everything else
  raises.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from vit_tpu.core.helpers import pair
from vit_tpu.layers.common import Conv, Dense, DropPath, LayerNorm, gelu_exact
from vit_tpu.ops.attention import apply_attention, attention_weights

__all__ = ["CCT", "cct_2", "cct_4", "cct_6", "cct_7", "cct_8",
           "cct_14", "cct_16"]

_LEGACY_KWARGS = ("padding", "pooling_padding", "mlp_radio")


def sinusoidal_embedding(n_positions: int, dim: int) -> np.ndarray:
    """Working sine table (reference cct.py:269-275 intent, §8.6 fix)."""
    pe = np.array(
        [[p / (10000 ** (2 * (i // 2) / dim)) for i in range(dim)]
         for p in range(n_positions)],
        dtype=np.float32,
    )
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe[None]


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class CCTAttention(nn.Module):
    """Reference cct.py:105-137: head_dim = dim//heads, dropout on the
    attention matrix and on the output projection."""

    dim: int
    num_heads: int = 8
    attention_dropout: float = 0.1
    projection_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        head_dim = self.dim // self.num_heads
        qkv = Dense(self.dim * 3, use_bias=False, dtype=self.dtype,
                    name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.num_heads),
            (q, k, v),
        )
        attn = attention_weights(q, k, scale=head_dim ** -0.5)
        attn = nn.Dropout(self.attention_dropout)(
            attn, deterministic=not training)
        out = apply_attention(attn.astype(v.dtype), v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = Dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.projection_dropout)(
            out, deterministic=not training)
        return out


class CCTEncoderLayer(nn.Module):
    """Reference cct.py:139-174 — note the mid-block LayerNorm *replaces*
    the residual stream before the FFN (cct.py:165)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    attention_dropout: float = 0.1
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, training: bool = False):
        h = LayerNorm(dtype=self.dtype, name="pre_norm")(src)
        h = CCTAttention(self.d_model, num_heads=self.nhead,
                         attention_dropout=self.attention_dropout,
                         projection_dropout=self.dropout, dtype=self.dtype,
                         name="self_attn")(h, training=training)
        h = DropPath(self.drop_path_rate, name="drop_path_attn")(
            h, training=training)
        src = src + h

        src = LayerNorm(dtype=self.dtype, name="norm1")(src)
        h = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not training)
        h = Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not training)
        h = DropPath(self.drop_path_rate, name="drop_path_ff")(
            h, training=training)
        return src + h


class CCT(nn.Module):
    """Constructor parity: reference cct.py:308-317 (+ the documented
    TransformerClassifier kwargs the reference forwards, cct.py:218-230)."""

    img_size: Any = 224
    embedding_dim: int = 768
    n_input_channels: int = 3
    n_conv_layers: int = 1
    kernel_size: int = 7
    stride: int = 2
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    positional_embedding: str = "sine"
    in_planes: int = 64
    dropout_rate: float = 0.0
    attention_dropout: float = 0.1
    stochastic_depth_rate: float = 0.1
    seq_pool: bool = True
    dtype: Any = jnp.float32
    # Legacy reference-README kwargs, accepted and ignored (§8.6).
    padding: Optional[int] = None
    pooling_padding: Optional[int] = None
    mlp_radio: Optional[float] = None

    def __post_init__(self):
        super().__post_init__()
        for k in _LEGACY_KWARGS:
            if getattr(self, k) is not None:
                warnings.warn(
                    f"CCT: legacy kwarg {k!r} is accepted for reference "
                    "compatibility but ignored", stacklevel=3)

    def sequence_length(self, n_channels: int = 3, height: int = 224,
                        width: int = 224) -> int:
        """Analytic replacement for the reference's dummy-forward probe
        (cct.py:204-209): SAME convs/pools give ceil(size/stride)."""
        h, w = height, width
        for _ in range(self.n_conv_layers):
            h = _ceil_div(h, self.stride)
            w = _ceil_div(w, self.stride)
            h = _ceil_div(h, self.pooling_stride)
            w = _ceil_div(w, self.pooling_stride)
        return h * w

    @nn.compact
    def __call__(self, img: jax.Array, training: bool = False) -> jax.Array:
        img_h, img_w = pair(self.img_size)
        seq_len = self.sequence_length(self.n_input_channels, img_h, img_w)

        # Tokenizer (reference cct.py:176-215)
        x = img
        for i in range(self.n_conv_layers):
            channels = (self.embedding_dim if i == self.n_conv_layers - 1
                        else self.in_planes)
            x = Conv(channels, (self.kernel_size, self.kernel_size),
                     strides=self.stride, padding="SAME", use_bias=False,
                     dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (self.pooling_kernel_size, self.pooling_kernel_size),
                strides=(self.pooling_stride, self.pooling_stride),
                padding="SAME")
        x = rearrange(x, "b h w c -> b (h w) c")

        # Classifier (reference cct.py:217-305)
        pos_mode = (self.positional_embedding
                    if self.positional_embedding in ("sine", "learnable", "none")
                    else "sine")
        n_pos = seq_len if self.seq_pool else seq_len + 1

        if not self.seq_pool:
            class_emb = self.param("class_emb", nn.initializers.zeros,
                                   (1, 1, self.embedding_dim))
            cls = jnp.tile(class_emb.astype(x.dtype), (x.shape[0], 1, 1))
            x = jnp.concatenate([cls, x], axis=1)

        if pos_mode == "learnable":
            pos = self.param(
                "positional_emb",
                lambda key, shape: 0.2 * jax.random.truncated_normal(
                    key, -2.0, 2.0, shape, jnp.float32),
                (1, n_pos, self.embedding_dim),
            )
            x = x + pos.astype(x.dtype)
        elif pos_mode == "sine":
            x = x + jnp.asarray(
                sinusoidal_embedding(n_pos, self.embedding_dim), x.dtype)
        # 'none': zero-pad shorter sequences (reference cct.py:278-280)
        elif x.shape[1] < seq_len:
            x = jnp.pad(x, ((0, 0), (0, seq_len - x.shape[1]), (0, 0)))

        x = nn.Dropout(self.dropout_rate)(x, deterministic=not training)

        dim_feedforward = int(self.embedding_dim * self.mlp_ratio)
        dpr = np.linspace(0.0, self.stochastic_depth_rate, self.num_layers)
        for i in range(self.num_layers):
            x = CCTEncoderLayer(
                d_model=self.embedding_dim, nhead=self.num_heads,
                dim_feedforward=dim_feedforward, dropout=self.dropout_rate,
                attention_dropout=self.attention_dropout,
                drop_path_rate=float(dpr[i]), dtype=self.dtype,
                name=f"block_{i}",
            )(x, training=training)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)

        if self.seq_pool:
            # attention pooling (reference cct.py:293-299)
            w = Dense(1, dtype=self.dtype, name="attention_pool")(x)
            w = jax.nn.softmax(w, axis=1)
            x = jnp.squeeze(jnp.einsum(
                "bnl,bnd->bld", w, x, preferred_element_type=jnp.float32,
            ).astype(x.dtype), axis=1)
        else:
            x = x[:, 0]

        return Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def _cct(num_layers, num_heads, mlp_ratio, embedding_dim,
         kernel_size=3, stride=None, **kwargs):
    stride = stride if stride is not None else max(1, (kernel_size // 2) - 1)
    return CCT(num_layers=num_layers, num_heads=num_heads,
               mlp_ratio=mlp_ratio, embedding_dim=embedding_dim,
               kernel_size=kernel_size, stride=stride, **kwargs)


def cct_2(**kw):
    return _cct(num_layers=2, num_heads=2, mlp_ratio=1, embedding_dim=128, **kw)


def cct_4(**kw):
    return _cct(num_layers=4, num_heads=2, mlp_ratio=1, embedding_dim=128, **kw)


def cct_6(**kw):
    return _cct(num_layers=6, num_heads=4, mlp_ratio=2, embedding_dim=256, **kw)


def cct_7(**kw):
    return _cct(num_layers=7, num_heads=4, mlp_ratio=2, embedding_dim=256, **kw)


def cct_8(**kw):
    return _cct(num_layers=8, num_heads=4, mlp_ratio=2, embedding_dim=256, **kw)


def cct_14(**kw):
    return _cct(num_layers=14, num_heads=6, mlp_ratio=3, embedding_dim=384, **kw)


def cct_16(**kw):
    return _cct(num_layers=16, num_heads=6, mlp_ratio=3, embedding_dim=384, **kw)
