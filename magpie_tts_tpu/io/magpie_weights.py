"""Magpie 357M weight pytrees + GGUF loading + synthetic init for tests.

Checkpoint tensor names follow the NeMo state dict (reference
docs/MAGPIE_ARCHITECTURE.md:264-307). Linear weights are transposed at load to
``[in, out]`` so the compute path is plain ``y = x @ W`` (feature dim last, which is
the TPU lane dimension). Per-layer tensors are stacked along a leading layer axis so
layer loops compile as ``lax.scan`` over a single fused weight array.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..config import MagpieConfig
from .gguf import GGUFReader


@flax.struct.dataclass
class EncoderWeights:
    pos_emb: jnp.ndarray        # [max_pos, d_model]
    norm_self: jnp.ndarray      # [L, d_model]
    qkv: jnp.ndarray            # [L, d_model, 3*d_model]
    sa_out: jnp.ndarray         # [L, d_model, d_model]
    norm_ff: jnp.ndarray        # [L, d_model]
    ff_proj: jnp.ndarray        # [L, k, d_model, d_ffn]
    ff_out: jnp.ndarray         # [L, k, d_ffn, d_model]
    norm_out: jnp.ndarray       # [d_model]


@flax.struct.dataclass
class DecoderWeights:
    pos_emb: jnp.ndarray        # [max_pos, d_model]
    norm_self: jnp.ndarray      # [L, d_model]
    qkv: jnp.ndarray            # [L, d_model, 3*d_model]
    sa_out: jnp.ndarray         # [L, d_model, d_model]
    norm_xa_q: jnp.ndarray      # [L, d_model]
    norm_xa_mem: jnp.ndarray    # [L, d_model]
    xa_q: jnp.ndarray           # [L, d_model, d_xa]
    xa_kv: jnp.ndarray          # [L, d_model, 2*d_xa]
    xa_out: jnp.ndarray         # [L, d_xa, d_model]
    norm_ff: jnp.ndarray        # [L, d_model]
    ff_proj: jnp.ndarray        # [L, d_model, d_ffn]   (kernel=1 -> pointwise)
    ff_out: jnp.ndarray         # [L, d_ffn, d_model]
    norm_out: jnp.ndarray       # [d_model]


@flax.struct.dataclass
class LocalTransformerWeights:
    in_proj_w: jnp.ndarray      # [d_model, lt_dim]
    in_proj_b: jnp.ndarray      # [lt_dim]
    pos_emb: jnp.ndarray        # [lt_max_pos, lt_dim]
    norm_self: jnp.ndarray      # [lt_dim]
    qkv: jnp.ndarray            # [lt_dim, 3*lt_dim]
    sa_out: jnp.ndarray         # [lt_dim, lt_dim]
    norm_ff: jnp.ndarray        # [lt_dim]
    ff_proj: jnp.ndarray        # [lt_dim, lt_ffn_dim]
    ff_out: jnp.ndarray         # [lt_ffn_dim, lt_dim]
    out_proj_w: jnp.ndarray     # [n_cb, lt_dim, vocab_per_cb]
    out_proj_b: jnp.ndarray     # [n_cb, vocab_per_cb]


@flax.struct.dataclass
class Int8DecoderStream:
    """Serving-quantized copies of the four weight matrices the fused decoder
    step streams from HBM every frame (~170MB/frame in bf16 — the single-stream
    bandwidth floor). Per-OUTPUT-COLUMN int8: W[:, o] ~ q[:, o] * s[o], so the
    kernel dequantizes by scaling the matmul OUTPUT ((x @ q) * s) — no per-
    element dequant pass, half the HBM weight traffic.

    This is a device serving format, not the GGUF Q8_0 block layout (io/quant.py
    keeps byte-compatibility with the reference converter for files on disk).
    """
    qkv_q: jnp.ndarray      # [L, d_model, 3*d_model] int8
    qkv_s: jnp.ndarray      # [L, 3*d_model] f32
    sa_out_q: jnp.ndarray   # [L, d_model, d_model] int8
    sa_out_s: jnp.ndarray   # [L, d_model] f32
    ff_proj_q: jnp.ndarray  # [L, d_model, d_ffn] int8
    ff_proj_s: jnp.ndarray  # [L, d_ffn] f32
    ff_out_q: jnp.ndarray   # [L, d_ffn, d_model] int8
    ff_out_s: jnp.ndarray   # [L, d_model] f32


def _colquant(w: jnp.ndarray):
    """[..., In, Out] -> (int8 q, f32 s[..., Out]) with W ~ q * s."""
    import jax.numpy as jnp_

    wf = jnp_.asarray(w, jnp_.float32)
    amax = jnp_.max(jnp_.abs(wf), axis=-2)
    s = jnp_.where(amax > 0, amax / 127.0, 1.0)
    q = jnp_.clip(jnp_.round(wf / s[..., None, :]), -127, 127).astype(jnp_.int8)
    return q, s


@flax.struct.dataclass
class Q8DecoderStream:
    """The GGUF Q8_0 checkpoint's OWN blocks, streamed natively: int8 values
    plus one f16-valued scale per 32 INPUT elements per output column
    (ggml block layout, reference scripts/convert_magpie_to_gguf.py:79-104),
    kept exactly as stored on disk instead of dequantized at load.

    The kernels dequantize in-kernel (``w = repeat(s, 32, in-axis) * q`` in
    f32, cast to the compute dtype): the product of an f16-valued scale and
    an int8 value is EXACT in f32, so the streamed matmuls are bit-identical
    to loading the same file through the ordinary dequantize-at-load path —
    at ~53% of the bf16 weight traffic. Unlike Int8DecoderStream (a serving
    REquantization, scales folded into matmul outputs), this is zero-
    requantization-error fidelity to the quantized checkpoint.
    """
    qkv_q: jnp.ndarray      # [L, d_model, 3*d_model] int8
    qkv_bs: jnp.ndarray     # [L, d_model//32, 3*d_model] f32 (f16-valued)
    sa_out_q: jnp.ndarray   # [L, d_model, d_model] int8
    sa_out_bs: jnp.ndarray  # [L, d_model//32, d_model] f32
    ff_proj_q: jnp.ndarray  # [L, d_model, d_ffn] int8
    ff_proj_bs: jnp.ndarray # [L, d_model//32, d_ffn] f32
    ff_out_q: jnp.ndarray   # [L, d_ffn, d_model] int8
    ff_out_bs: jnp.ndarray  # [L, d_ffn//32, d_model] f32


def _q8_split_t(payload: np.ndarray, out_dim: int, in_dim: int):
    """Raw Q8_0 payload of a [out, in] (torch-layout) tensor ->
    (q [in, out] int8, s [in//32, out] f32). ggml blocks run along the
    contiguous ``in`` axis; both arrays are transposed to the repo's
    [in, out] matmul convention."""
    from . import quant

    q, s = quant.split_q8_0(payload, out_dim * in_dim)
    q = q.reshape(out_dim, in_dim).T                      # [in, out]
    s = s.reshape(out_dim, in_dim // quant.QK).T          # [in//32, out]
    return np.ascontiguousarray(q), np.ascontiguousarray(s)


def q8_stream_from_gguf(reader, config) -> "Q8DecoderStream":
    """Build the native Q8_0 stream from a Q8_0-quantized Magpie GGUF.

    Raises ValueError if any of the four streamed decoder matrices is not
    stored as Q8_0 (mixed checkpoints fall back to load-time dequant).
    """
    from .gguf import GGML_Q8_0

    c = config
    D, F = c.d_model, c.d_ffn

    def pull(fmt, out_dim, in_dim, conv=False):
        qs, ss = [], []
        for layer in range(c.dec_layers):
            name = fmt.format(layer)
            info = reader.tensors[name]
            if info.ggml_type != GGML_Q8_0:
                raise ValueError(
                    f"{name}: not Q8_0 (type {info.ggml_type}); "
                    "Q8_0-native streaming needs a fully Q8_0 decoder")
            q, s = _q8_split_t(reader.raw(name), out_dim, in_dim)
            qs.append(q)
            ss.append(s)
        return np.stack(qs), np.stack(ss)

    qkv_q, qkv_s = pull("decoder.layers.{}.self_attention.qkv_net.weight",
                        3 * D, D)
    sao_q, sao_s = pull("decoder.layers.{}.self_attention.o_net.weight", D, D)
    # conv weights are [out, in, 1]: the trailing unit dim doesn't change the
    # contiguous block order, so the same split applies.
    ffp_q, ffp_s = pull("decoder.layers.{}.pos_ff.proj.conv.weight", F, D)
    ffo_q, ffo_s = pull("decoder.layers.{}.pos_ff.o_net.conv.weight", D, F)
    import jax

    return jax.tree.map(jnp.asarray, Q8DecoderStream(
        qkv_q=qkv_q, qkv_bs=qkv_s, sa_out_q=sao_q, sa_out_bs=sao_s,
        ff_proj_q=ffp_q, ff_proj_bs=ffp_s, ff_out_q=ffo_q, ff_out_bs=ffo_s))


def q8_stream_from_arrays(dec: "DecoderWeights") -> "Q8DecoderStream":
    """Round-trip float decoder weights through the Q8_0 byte codec (tests /
    benchmarks on synthetic weights; real checkpoints use q8_stream_from_gguf).
    The matching dequantized-weights oracle is ``q8_dequantized_decoder``."""
    from . import quant

    def rt(w):  # [L, in, out] float -> per-layer torch-layout [out, in] bytes
        qs, ss = [], []
        L = w.shape[0]
        for layer in range(L):
            t = np.asarray(w[layer], np.float32).T        # [out, in]
            payload = np.frombuffer(quant.quantize_q8_0(t), np.uint8)
            q, s = _q8_split_t(payload, t.shape[0], t.shape[1])
            qs.append(q)
            ss.append(s)
        return np.stack(qs), np.stack(ss)

    qkv_q, qkv_s = rt(dec.qkv)
    sao_q, sao_s = rt(dec.sa_out)
    ffp_q, ffp_s = rt(dec.ff_proj)
    ffo_q, ffo_s = rt(dec.ff_out)
    import jax

    return jax.tree.map(jnp.asarray, Q8DecoderStream(
        qkv_q=qkv_q, qkv_bs=qkv_s, sa_out_q=sao_q, sa_out_bs=sao_s,
        ff_proj_q=ffp_q, ff_proj_bs=ffp_s, ff_out_q=ffo_q, ff_out_bs=ffo_s))


def q8_dequantized_decoder(dec: "DecoderWeights",
                           q8: "Q8DecoderStream") -> "DecoderWeights":
    """The load-time-dequant oracle for a Q8 stream: decoder weights with the
    four streamed matrices replaced by their block-dequantized values."""
    def deq(q, s):
        rep = jnp.repeat(s.astype(jnp.float32), 32, axis=1)   # [L, in, out]
        return rep * q.astype(jnp.float32)

    return dec.replace(qkv=deq(q8.qkv_q, q8.qkv_bs),
                       sa_out=deq(q8.sa_out_q, q8.sa_out_bs),
                       ff_proj=deq(q8.ff_proj_q, q8.ff_proj_bs),
                       ff_out=deq(q8.ff_out_q, q8.ff_out_bs))


def quantize_decoder_stream(dec: "DecoderWeights") -> Int8DecoderStream:
    qkv_q, qkv_s = _colquant(dec.qkv)
    sao_q, sao_s = _colquant(dec.sa_out)
    ffp_q, ffp_s = _colquant(dec.ff_proj)
    ffo_q, ffo_s = _colquant(dec.ff_out)
    return Int8DecoderStream(qkv_q=qkv_q, qkv_s=qkv_s, sa_out_q=sao_q,
                             sa_out_s=sao_s, ff_proj_q=ffp_q, ff_proj_s=ffp_s,
                             ff_out_q=ffo_q, ff_out_s=ffo_s)


@flax.struct.dataclass
class MagpieWeights:
    text_emb: jnp.ndarray       # [text_vocab, d_model]
    audio_emb: jnp.ndarray      # [n_cb, vocab_per_cb, d_model]
    baked_context: jnp.ndarray  # [num_speakers, context_frames, d_model]
    encoder: EncoderWeights
    decoder: DecoderWeights
    final_proj_w: jnp.ndarray   # [d_model, n_cb * vocab_per_cb]
    final_proj_b: jnp.ndarray   # [n_cb * vocab_per_cb]
    lt: LocalTransformerWeights

    def astype(self, dtype) -> "MagpieWeights":
        import jax

        return jax.tree.map(lambda x: x.astype(dtype), self)


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _conv_ffn_w(x: np.ndarray) -> np.ndarray:
    """PyTorch conv weight [out, in, k] -> [k, in, out]."""
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


def load_magpie_weights(path: str, config: Optional[MagpieConfig] = None, dtype=jnp.float32,
                        reader=None):
    """Load a Magpie GGUF checkpoint into (config, MagpieWeights).

    Uses the native C++ parser when built (io/native.py), else pure Python.
    """
    if reader is None:
        from .native import open_gguf

        reader = open_gguf(path)
    if config is None:
        config = MagpieConfig.from_gguf_metadata(reader.metadata)
    get = reader.tensor
    c = config

    def stack(fmt: str, n: int, transform):
        return np.stack([transform(get(fmt.format(i))) for i in range(n)])

    enc = EncoderWeights(
        pos_emb=get("encoder.position_embeddings.weight"),
        norm_self=stack("encoder.layers.{}.norm_self.weight", c.enc_layers, lambda x: x),
        qkv=stack("encoder.layers.{}.self_attention.qkv_net.weight", c.enc_layers, _t),
        sa_out=stack("encoder.layers.{}.self_attention.o_net.weight", c.enc_layers, _t),
        norm_ff=stack("encoder.layers.{}.norm_pos_ff.weight", c.enc_layers, lambda x: x),
        ff_proj=stack("encoder.layers.{}.pos_ff.proj.conv.weight", c.enc_layers, _conv_ffn_w),
        ff_out=stack("encoder.layers.{}.pos_ff.o_net.conv.weight", c.enc_layers, _conv_ffn_w),
        norm_out=get("encoder.norm_out.weight"),
    )
    dec = DecoderWeights(
        pos_emb=get("decoder.position_embeddings.weight"),
        norm_self=stack("decoder.layers.{}.norm_self.weight", c.dec_layers, lambda x: x),
        qkv=stack("decoder.layers.{}.self_attention.qkv_net.weight", c.dec_layers, _t),
        sa_out=stack("decoder.layers.{}.self_attention.o_net.weight", c.dec_layers, _t),
        norm_xa_q=stack("decoder.layers.{}.norm_xattn_query.weight", c.dec_layers, lambda x: x),
        norm_xa_mem=stack("decoder.layers.{}.norm_xattn_memory.weight", c.dec_layers, lambda x: x),
        xa_q=stack("decoder.layers.{}.cross_attention.q_net.weight", c.dec_layers, _t),
        xa_kv=stack("decoder.layers.{}.cross_attention.kv_net.weight", c.dec_layers, _t),
        xa_out=stack("decoder.layers.{}.cross_attention.o_net.weight", c.dec_layers, _t),
        norm_ff=stack("decoder.layers.{}.norm_pos_ff.weight", c.dec_layers, lambda x: x),
        ff_proj=stack("decoder.layers.{}.pos_ff.proj.conv.weight", c.dec_layers,
                      lambda x: _t(x[:, :, 0])),
        ff_out=stack("decoder.layers.{}.pos_ff.o_net.conv.weight", c.dec_layers,
                     lambda x: _t(x[:, :, 0])),
        norm_out=get("decoder.norm_out.weight"),
    )
    lt = LocalTransformerWeights(
        in_proj_w=_t(get("local_transformer_in_projection.weight")),
        in_proj_b=get("local_transformer_in_projection.bias"),
        pos_emb=get("local_transformer.position_embeddings.weight"),
        norm_self=get("local_transformer.layers.0.norm_self.weight"),
        qkv=_t(get("local_transformer.layers.0.self_attention.qkv_net.weight")),
        sa_out=_t(get("local_transformer.layers.0.self_attention.o_net.weight")),
        norm_ff=get("local_transformer.layers.0.norm_pos_ff.weight"),
        ff_proj=_t(get("local_transformer.layers.0.pos_ff.proj.conv.weight")[:, :, 0]),
        ff_out=_t(get("local_transformer.layers.0.pos_ff.o_net.conv.weight")[:, :, 0]),
        out_proj_w=stack("local_transformer_out_projections.{}.weight", c.num_codebooks, _t),
        out_proj_b=stack("local_transformer_out_projections.{}.bias", c.num_codebooks,
                         lambda x: x),
    )
    weights = MagpieWeights(
        text_emb=get("text_embedding.weight"),
        audio_emb=np.stack([get(f"audio_embeddings.{i}.weight") for i in range(c.num_codebooks)]),
        baked_context=get("baked_context_embedding.weight").reshape(
            c.num_speakers, c.context_frames, c.d_model),
        encoder=enc,
        decoder=dec,
        final_proj_w=_t(get("final_proj.weight")),
        final_proj_b=get("final_proj.bias"),
        lt=lt,
    )
    import jax

    weights = jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), weights)
    return config, weights


def random_magpie_weights(config: MagpieConfig, seed: int = 0, scale: float = 0.02,
                          dtype=jnp.float32) -> MagpieWeights:
    """Synthetic weights with realistic scales (tests / benchmarks)."""
    rng = np.random.default_rng(seed)
    c = config

    def w(*shape):
        return rng.normal(0.0, scale, size=shape).astype(np.float32)

    def g(*shape):
        return (1.0 + rng.normal(0.0, 0.05, size=shape)).astype(np.float32)

    enc = EncoderWeights(
        pos_emb=w(c.max_pos, c.d_model),
        norm_self=g(c.enc_layers, c.d_model),
        qkv=w(c.enc_layers, c.d_model, 3 * c.d_model),
        sa_out=w(c.enc_layers, c.d_model, c.d_model),
        norm_ff=g(c.enc_layers, c.d_model),
        ff_proj=w(c.enc_layers, c.enc_kernel, c.d_model, c.d_ffn),
        ff_out=w(c.enc_layers, c.enc_kernel, c.d_ffn, c.d_model),
        norm_out=g(c.d_model),
    )
    dec = DecoderWeights(
        pos_emb=w(c.max_pos, c.d_model),
        norm_self=g(c.dec_layers, c.d_model),
        qkv=w(c.dec_layers, c.d_model, 3 * c.d_model),
        sa_out=w(c.dec_layers, c.d_model, c.d_model),
        norm_xa_q=g(c.dec_layers, c.d_model),
        norm_xa_mem=g(c.dec_layers, c.d_model),
        xa_q=w(c.dec_layers, c.d_model, c.d_xa),
        xa_kv=w(c.dec_layers, c.d_model, 2 * c.d_xa),
        xa_out=w(c.dec_layers, c.d_xa, c.d_model),
        norm_ff=g(c.dec_layers, c.d_model),
        ff_proj=w(c.dec_layers, c.d_model, c.d_ffn),
        ff_out=w(c.dec_layers, c.d_ffn, c.d_model),
        norm_out=g(c.d_model),
    )
    lt = LocalTransformerWeights(
        in_proj_w=w(c.d_model, c.lt_dim),
        in_proj_b=w(c.lt_dim),
        pos_emb=w(c.lt_max_pos, c.lt_dim),
        norm_self=g(c.lt_dim),
        qkv=w(c.lt_dim, 3 * c.lt_dim),
        sa_out=w(c.lt_dim, c.lt_dim),
        norm_ff=g(c.lt_dim),
        ff_proj=w(c.lt_dim, c.lt_ffn_dim),
        ff_out=w(c.lt_ffn_dim, c.lt_dim),
        out_proj_w=w(c.num_codebooks, c.lt_dim, c.vocab_per_cb),
        out_proj_b=w(c.num_codebooks, c.vocab_per_cb),
    )
    import jax

    weights = MagpieWeights(
        text_emb=w(c.text_vocab_size, c.d_model),
        audio_emb=w(c.num_codebooks, c.vocab_per_cb, c.d_model),
        baked_context=w(c.num_speakers, c.context_frames, c.d_model),
        encoder=enc,
        decoder=dec,
        final_proj_w=w(c.d_model, c.num_codebooks * c.vocab_per_cb),
        final_proj_b=w(c.num_codebooks * c.vocab_per_cb),
        lt=lt,
    )
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), weights)
