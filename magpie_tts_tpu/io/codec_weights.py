"""Nano-codec decoder weight pytrees + GGUF loading + synthetic init.

GGUF tensor names are the shortened forms written by the reference converter
(scripts/convert_codec_to_gguf.py shorten_name): ``dec.pre.weight``,
``dec.up.{i}.c.weight``, ``dec.act.{i}.activation.snake_act.alpha``,
``dec.rl.{i}.rb.{j}.rb.{k}.in_conv.weight`` etc. Weight-norm is already folded by
the converter. Conv weights are stored PyTorch-shaped [out, in, k] and transposed
here to WIO ``[k, in, out]`` for NWC convs.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig
from .gguf import GGUFReader


@flax.struct.dataclass
class ResBlockWeights:
    """One inner residual block (in-act -> dilated conv -> skip-act -> conv)."""
    in_alpha: jnp.ndarray    # [ch//2]
    in_conv_w: jnp.ndarray   # [k, ch, ch]
    in_conv_b: jnp.ndarray   # [ch]
    sk_alpha: jnp.ndarray    # [ch//2]
    sk_conv_w: jnp.ndarray   # [k, ch, ch]
    sk_conv_b: jnp.ndarray   # [ch]


@flax.struct.dataclass
class UpsampleStageWeights:
    act_alpha: jnp.ndarray   # [in_ch//2] HalfSnake before the upsample
    convt_w: jnp.ndarray     # [in_ch, K] grouped ConvTranspose1d (PyTorch [in_ch,1,K])
    convt_b: jnp.ndarray     # [out_ch]
    # res layer: 3 kernel branches x 3 dilation blocks
    resblocks: Tuple[Tuple[ResBlockWeights, ...], ...]


@flax.struct.dataclass
class CodecWeights:
    pre_conv_w: jnp.ndarray   # [7, latent_dim, base_ch]
    pre_conv_b: jnp.ndarray   # [base_ch]
    stages: Tuple[UpsampleStageWeights, ...]  # 5 stages
    post_alpha: jnp.ndarray   # [final_ch//2]
    post_conv_w: jnp.ndarray  # [3, final_ch, 1]
    post_conv_b: jnp.ndarray  # [1]

    def astype(self, dtype) -> "CodecWeights":
        return jax.tree.map(lambda x: x.astype(dtype), self)


def _wio(x: np.ndarray) -> np.ndarray:
    """PyTorch conv weight [out, in, k] -> WIO [k, in, out]."""
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


def load_codec_weights(path: str, config: CodecConfig = None, dtype=jnp.float32,
                       reader=None):
    if reader is None:
        from .native import open_gguf

        reader = open_gguf(path)
    if config is None:
        config = CodecConfig.from_gguf_metadata(reader.metadata)
    get = reader.tensor

    def alpha(name):
        return get(name).reshape(-1)  # stored [1, C/2, 1]

    stages = []
    for i in range(len(config.up_sample_rates)):
        branches = []
        for j in range(len(config.resblock_kernel_sizes)):
            blocks = []
            for k in range(len(config.resblock_dilations)):
                p = f"dec.rl.{i}.rb.{j}.rb.{k}"
                blocks.append(ResBlockWeights(
                    in_alpha=alpha(f"{p}.in_act.alpha"),
                    in_conv_w=_wio(get(f"{p}.in_conv.weight")),
                    in_conv_b=get(f"{p}.in_conv.bias"),
                    sk_alpha=alpha(f"{p}.sk_act.alpha"),
                    sk_conv_w=_wio(get(f"{p}.sk_conv.weight")),
                    sk_conv_b=get(f"{p}.sk_conv.bias"),
                ))
            branches.append(tuple(blocks))
        convt = get(f"dec.up.{i}.c.weight")  # PyTorch [in_ch, 1, K]
        stages.append(UpsampleStageWeights(
            act_alpha=alpha(f"dec.act.{i}.activation.snake_act.alpha"),
            convt_w=np.ascontiguousarray(convt[:, 0, :]),
            convt_b=get(f"dec.up.{i}.c.bias"),
            resblocks=tuple(branches),
        ))

    weights = CodecWeights(
        pre_conv_w=_wio(get("dec.pre.weight")),
        pre_conv_b=get("dec.pre.bias"),
        stages=tuple(stages),
        post_alpha=alpha("dec.post_act.alpha"),
        post_conv_w=_wio(get("dec.post.weight")),
        post_conv_b=get("dec.post.bias"),
    )
    weights = jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), weights)
    return config, weights


def random_codec_weights(config: CodecConfig, seed: int = 0, dtype=jnp.float32) -> CodecWeights:
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.1):
        return rng.normal(0.0, scale, size=shape).astype(np.float32)

    def a(n):
        return (0.5 + rng.uniform(0.1, 1.0, size=(n,))).astype(np.float32)

    in_chs = (config.base_channels,) + config.up_channels[:-1]
    stages = []
    for i, (in_ch, out_ch, k_up) in enumerate(
            zip(in_chs, config.up_channels, config.up_kernels)):
        branches = []
        for ksize in config.resblock_kernel_sizes:
            blocks = tuple(
                ResBlockWeights(
                    in_alpha=a(out_ch // 2),
                    in_conv_w=w(ksize, out_ch, out_ch),
                    in_conv_b=w(out_ch),
                    sk_alpha=a(out_ch // 2),
                    sk_conv_w=w(ksize, out_ch, out_ch),
                    sk_conv_b=w(out_ch),
                ) for _ in config.resblock_dilations)
            branches.append(blocks)
        stages.append(UpsampleStageWeights(
            act_alpha=a(in_ch // 2),
            convt_w=w(in_ch, k_up),
            convt_b=w(out_ch),
            resblocks=tuple(branches),
        ))

    weights = CodecWeights(
        pre_conv_w=w(config.pre_conv_kernel, config.latent_dim, config.base_channels),
        pre_conv_b=w(config.base_channels),
        stages=tuple(stages),
        post_alpha=a(config.up_channels[-1] // 2),
        post_conv_w=w(config.post_conv_kernel, config.up_channels[-1], 1),
        post_conv_b=w(1),
    )
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), weights)
