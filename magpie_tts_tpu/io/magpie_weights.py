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
    an int8 value is EXACT in f32, so the streamed matmuls see weight tiles
    bit-identical to the ordinary dequantize-at-load path's — at ~53% of the
    bf16 weight traffic, with ZERO requantization error (unlike
    Int8DecoderStream, a serving REquantization with scales folded into
    matmul outputs). Numerics contract (docs/PARITY.md "Q8_0-native
    serving"): sampled/argmax CODES are exactly equal to the dequant-at-load
    path; float hiddens may differ at the ~1-ulp level where the compiler
    fuses the dequant multiply into a dot and picks a different reduction
    order.
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

    if in_dim % quant.QK != 0:
        # quantize_q8_0 pads the FLATTENED tensor, so blocks would straddle
        # rows and the per-row split below would silently mis-scale values.
        raise ValueError(
            f"Q8_0-native streaming needs in_dim % {quant.QK} == 0, got "
            f"shape [{out_dim}, {in_dim}]")
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

    def pull(fmt, out_dim, in_dim):
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


@flax.struct.dataclass
class Q8Blocks:
    """A weight tensor kept as its GGUF Q8_0 blocks (full-native serving).

    With ``--serve-q8`` every tensor on the converter's quant allowlist
    (reference scripts/convert_magpie_to_gguf.py:156-178 — encoder/decoder/LT
    attention + FFN matrices, cross-attention, final/LT projections) stays in
    this form INSIDE the weights pytree: persistent HBM holds the checkpoint's
    own int8 blocks (~1/3 the f32 bytes), and each jitted program calls
    ``materialize_weights`` at entry, so dense copies exist only transiently
    inside a program invocation (XLA hoists the dequant out of decode loops —
    it runs once per utterance, not per frame). The four per-frame decoder
    matrices additionally stream natively in-kernel via ``Q8DecoderStream``.

    Dequant here is the same exact f32 product as the load-time path
    (f16-valued scale x int8), followed by the loader's own layout transform —
    the materialized tensors are BIT-IDENTICAL to ``load_magpie_weights`` on
    the same file (pinned by tests/test_io.py::test_q8_native_load_*).
    """
    q: jnp.ndarray     # [*lead, n_blocks, 32] int8 (torch-flattened order)
    s: jnp.ndarray     # [*lead, n_blocks, 1] f32 (f16-valued)
    torch_shape: tuple = flax.struct.field(pytree_node=False)
    # Loader transform: "linear" (= _t), "conv1" (= [:, :, 0] then _t),
    # "conv_ffn" (= transpose (2,1,0)).
    transform: str = flax.struct.field(pytree_node=False)

    def materialize(self, dtype) -> jnp.ndarray:
        lead = self.q.shape[:-2]
        flat = self.s.astype(jnp.float32) * self.q.astype(jnp.float32)
        w = flat.reshape(*lead, *self.torch_shape)
        if self.transform == "linear":
            w = jnp.swapaxes(w, -1, -2)
        elif self.transform == "conv1":
            w = jnp.swapaxes(w[..., 0], -1, -2)
        elif self.transform == "conv_ffn":
            # [..., out, in, k] -> [..., k, in, out] (loader's _conv_ffn_w)
            w = jnp.swapaxes(w, -1, -3)
        else:
            raise ValueError(self.transform)
        return w.astype(dtype)


def _q8_blocks_from_reader(reader, names, torch_shape, transform) -> Q8Blocks:
    """Stacked Q8Blocks for one tensor (or a [L]-stack of same-shape
    tensors) read RAW from a Q8_0 GGUF."""
    from . import quant
    from .gguf import GGML_Q8_0

    n = int(np.prod(torch_shape))
    if n % quant.QK != 0:
        raise ValueError(f"{names[0]}: {torch_shape} not /{quant.QK}")
    qs, ss = [], []
    for name in names:
        info = reader.tensors[name]
        if info.ggml_type != GGML_Q8_0:
            raise ValueError(
                f"{name}: not Q8_0 (type {info.ggml_type}); full-native "
                "serving needs the allowlisted tensors stored as Q8_0")
        q, s = quant.split_q8_0(reader.raw(name), n)
        qs.append(q.reshape(-1, quant.QK))
        ss.append(s.reshape(-1, 1))
    q = np.stack(qs) if len(names) > 1 else qs[0]
    s = np.stack(ss) if len(names) > 1 else ss[0]
    return Q8Blocks(q=jnp.asarray(q), s=jnp.asarray(s.astype(np.float32)),
                    torch_shape=tuple(torch_shape), transform=transform)


def materialize_weights(weights: "MagpieWeights",
                        dtype=None) -> "MagpieWeights":
    """Replace every Q8Blocks node by its dequantized dense tensor.

    Call at the top of a jitted program: dense copies then live only inside
    that invocation. ``dtype`` defaults to the pytree's compute dtype
    (text_emb — never quantized). No-op on fully dense pytrees.
    """
    import jax

    dtype = dtype or weights.text_emb.dtype
    return jax.tree.map(
        lambda x: x.materialize(dtype) if isinstance(x, Q8Blocks) else x,
        weights, is_leaf=lambda x: isinstance(x, Q8Blocks))


def has_q8_blocks(weights) -> bool:
    import jax

    return any(isinstance(x, Q8Blocks) for x in jax.tree.leaves(
        weights, is_leaf=lambda x: isinstance(x, Q8Blocks)))


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

        # Q8Blocks keep their block storage dtypes (int8 q + f32 scales);
        # materialize_weights dequantizes straight to the pytree's compute
        # dtype (text_emb), so the f32-dequant -> astype ordering matches the
        # dense load path bit-for-bit.
        return jax.tree.map(
            lambda x: x if isinstance(x, Q8Blocks) else x.astype(dtype),
            self, is_leaf=lambda x: isinstance(x, Q8Blocks))


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _conv_ffn_w(x: np.ndarray) -> np.ndarray:
    """PyTorch conv weight [out, in, k] -> [k, in, out]."""
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


def load_magpie_weights(path: str, config: Optional[MagpieConfig] = None, dtype=jnp.float32,
                        reader=None, q8_native: bool = False):
    """Load a Magpie GGUF checkpoint into (config, MagpieWeights).

    Uses the native C++ parser when built (io/native.py), else pure Python.

    ``q8_native=True`` (``--serve-q8``): every allowlisted tensor that is
    stored as Q8_0 stays as its raw blocks (``Q8Blocks``) inside the pytree —
    no dense copy is built at load; programs dequantize at entry via
    ``materialize_weights``. Tensors the converter left dense load normally.
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

    def q8_or(fmt: str, n: int, transform, torch_shape, kind):
        """Q8Blocks when q8-native serving is on and the file stores Q8_0;
        the ordinary dense load otherwise. ``n=0``: single unstacked tensor."""
        from .gguf import GGML_Q8_0

        names = [fmt] if n == 0 else [fmt.format(i) for i in range(n)]
        if q8_native and all(reader.tensors[nm].ggml_type == GGML_Q8_0
                             for nm in names):
            return _q8_blocks_from_reader(reader, names, torch_shape, kind)
        if n == 0:
            return transform(get(fmt))
        return stack(fmt, n, transform)

    D, F, k = c.d_model, c.d_ffn, c.enc_kernel
    enc = EncoderWeights(
        pos_emb=get("encoder.position_embeddings.weight"),
        norm_self=stack("encoder.layers.{}.norm_self.weight", c.enc_layers, lambda x: x),
        qkv=q8_or("encoder.layers.{}.self_attention.qkv_net.weight", c.enc_layers,
                  _t, (3 * D, D), "linear"),
        sa_out=q8_or("encoder.layers.{}.self_attention.o_net.weight", c.enc_layers,
                     _t, (D, D), "linear"),
        norm_ff=stack("encoder.layers.{}.norm_pos_ff.weight", c.enc_layers, lambda x: x),
        ff_proj=q8_or("encoder.layers.{}.pos_ff.proj.conv.weight", c.enc_layers,
                      _conv_ffn_w, (F, D, k), "conv_ffn"),
        ff_out=q8_or("encoder.layers.{}.pos_ff.o_net.conv.weight", c.enc_layers,
                     _conv_ffn_w, (D, F, k), "conv_ffn"),
        norm_out=get("encoder.norm_out.weight"),
    )
    dec = DecoderWeights(
        pos_emb=get("decoder.position_embeddings.weight"),
        norm_self=stack("decoder.layers.{}.norm_self.weight", c.dec_layers, lambda x: x),
        qkv=q8_or("decoder.layers.{}.self_attention.qkv_net.weight", c.dec_layers,
                  _t, (3 * D, D), "linear"),
        sa_out=q8_or("decoder.layers.{}.self_attention.o_net.weight", c.dec_layers,
                     _t, (D, D), "linear"),
        norm_xa_q=stack("decoder.layers.{}.norm_xattn_query.weight", c.dec_layers, lambda x: x),
        norm_xa_mem=stack("decoder.layers.{}.norm_xattn_memory.weight", c.dec_layers, lambda x: x),
        xa_q=q8_or("decoder.layers.{}.cross_attention.q_net.weight", c.dec_layers,
                   _t, (c.d_xa, D), "linear"),
        xa_kv=q8_or("decoder.layers.{}.cross_attention.kv_net.weight", c.dec_layers,
                    _t, (2 * c.d_xa, D), "linear"),
        xa_out=q8_or("decoder.layers.{}.cross_attention.o_net.weight", c.dec_layers,
                     _t, (D, c.d_xa), "linear"),
        norm_ff=stack("decoder.layers.{}.norm_pos_ff.weight", c.dec_layers, lambda x: x),
        ff_proj=q8_or("decoder.layers.{}.pos_ff.proj.conv.weight", c.dec_layers,
                      lambda x: _t(x[:, :, 0]), (F, D, 1), "conv1"),
        ff_out=q8_or("decoder.layers.{}.pos_ff.o_net.conv.weight", c.dec_layers,
                     lambda x: _t(x[:, :, 0]), (D, F, 1), "conv1"),
        norm_out=get("decoder.norm_out.weight"),
    )
    lt = LocalTransformerWeights(
        in_proj_w=q8_or("local_transformer_in_projection.weight", 0,
                        _t, (c.lt_dim, D), "linear"),
        in_proj_b=get("local_transformer_in_projection.bias"),
        pos_emb=get("local_transformer.position_embeddings.weight"),
        norm_self=get("local_transformer.layers.0.norm_self.weight"),
        qkv=q8_or("local_transformer.layers.0.self_attention.qkv_net.weight", 0,
                  _t, (3 * c.lt_dim, c.lt_dim), "linear"),
        sa_out=q8_or("local_transformer.layers.0.self_attention.o_net.weight", 0,
                     _t, (c.lt_dim, c.lt_dim), "linear"),
        norm_ff=get("local_transformer.layers.0.norm_pos_ff.weight"),
        ff_proj=q8_or("local_transformer.layers.0.pos_ff.proj.conv.weight", 0,
                      lambda x: _t(x[:, :, 0]), (c.lt_ffn_dim, c.lt_dim, 1),
                      "conv1"),
        ff_out=q8_or("local_transformer.layers.0.pos_ff.o_net.conv.weight", 0,
                     lambda x: _t(x[:, :, 0]), (c.lt_dim, c.lt_ffn_dim, 1),
                     "conv1"),
        out_proj_w=q8_or("local_transformer_out_projections.{}.weight",
                         c.num_codebooks, _t, (c.vocab_per_cb, c.lt_dim),
                         "linear"),
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
        final_proj_w=q8_or("final_proj.weight", 0, _t,
                           (c.num_codebooks * c.vocab_per_cb, D), "linear"),
        final_proj_b=get("final_proj.bias"),
        lt=lt,
    )
    import jax

    # Q8Blocks keep their storage dtypes; dense leaves cast to ``dtype``.
    weights = jax.tree.map(
        lambda x: x if isinstance(x, Q8Blocks) else jnp.asarray(x, dtype=dtype),
        weights, is_leaf=lambda x: isinstance(x, Q8Blocks))
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
