"""Synthetic GGUF checkpoint writers for tests: produce files with the exact
tensor names / shapes / metadata the real converters emit
(convert_magpie_to_gguf.py, convert_codec_to_gguf.py), at tiny-config scale."""

from __future__ import annotations

import numpy as np

from magpie_tts_tpu.io import gguf
from tests.utils import tiny_codec_config, tiny_magpie_config


def write_tiny_magpie_gguf(path: str, seed: int = 0, quant=None,
                           config=None) -> None:
    """Synthesize a structurally complete magpie GGUF (full tensor-name map,
    tokenizer payload, both hparam spellings). ``config=None`` writes the tiny
    test config; pass ``MagpieConfig()`` for a full-size (357M-class) file —
    same code path, production shapes."""
    c = config if config is not None else tiny_magpie_config()
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.02):
        return rng.normal(0, scale, size=shape).astype(np.float32)

    def g(*shape):
        return (1.0 + rng.normal(0, 0.05, size=shape)).astype(np.float32)

    writer = gguf.GGUFWriter()
    writer.add_metadata("general.architecture", "magpie")
    # Converter-spelled keys (the aliased spellings the reference writes).
    writer.add_metadata("magpie.d_model", c.d_model)
    writer.add_metadata("magpie.d_ffn", c.d_ffn)
    writer.add_metadata("magpie.d_head", c.d_head)
    writer.add_metadata("magpie.encoder_layers", c.enc_layers)
    writer.add_metadata("magpie.decoder_layers", c.dec_layers)
    writer.add_metadata("magpie.encoder_heads", c.enc_heads)
    writer.add_metadata("magpie.enc_kernel", c.enc_kernel)
    writer.add_metadata("magpie.decoder_sa_heads", c.dec_sa_heads)
    writer.add_metadata("magpie.decoder_xa_heads", c.dec_xa_heads)
    writer.add_metadata("magpie.dec_xa_d_head", c.dec_xa_d_head)
    writer.add_metadata("magpie.local_transformer_dim", c.lt_dim)
    writer.add_metadata("magpie.lt_ffn_dim", c.lt_ffn_dim)
    writer.add_metadata("magpie.text_vocab_size", c.text_vocab_size)
    writer.add_metadata("magpie.num_codebooks", c.num_codebooks)
    writer.add_metadata("magpie.codebook_size", c.codebook_size)
    writer.add_metadata("magpie.vocab_size_per_codebook", c.vocab_per_cb)
    writer.add_metadata("magpie.num_baked_speakers", c.num_speakers)
    writer.add_metadata("magpie.baked_context_frames", c.context_frames)
    writer.add_metadata("magpie.text_bos_id", c.text_bos_id)
    writer.add_metadata("magpie.text_eos_id", c.text_eos_id)
    writer.add_metadata("magpie.audio_bos_id", c.audio_bos_id)
    writer.add_metadata("magpie.audio_eos_id", c.audio_eos_id)
    writer.add_metadata("magpie.max_dec_steps", c.max_dec_steps)
    writer.add_metadata("magpie.min_generated_frames", c.min_generated_frames)
    writer.add_metadata("magpie.max_pos", c.max_pos)

    # Tokenizer payload: small vocab + dict in the documented metadata format.
    vocab = (["a", "b", "c", "d", "e", "f"] +
             [",", ".", "!", "?", ":", ";"] +
             [chr(x) for x in range(ord("A"), ord("Z") + 1)] +
             [f"t{i}" for i in range(38, 93)] + [" ", "<pad>", "<oov>"])
    writer.add_metadata("magpie.tokenizer.vocab", "\n".join(vocab))
    writer.add_metadata("magpie.tokenizer.dict", "hello\tabcd\nworld\tfeda")
    writer.add_metadata("magpie.tokenizer.space", 93)
    writer.add_metadata("magpie.tokenizer.pad", 94)
    writer.add_metadata("magpie.tokenizer.oov", 95)

    # Same tensor gate as the real converter's QUANT_PATTERNS
    # (tools/convert_nemo_to_gguf.py:37-44): attention/FFN/projection weight
    # matrices quantize, everything else (norms, biases, embeddings) stays f32.
    import re
    _qpat = (r"\.(qkv_net|o_net|q_net|kv_net)\.weight$",
             r"\.pos_ff\.(proj|o_net)\.conv\.weight$",
             r"^final_proj\.weight$",
             r"^local_transformer_(out_projections\.\d+|in_projection)\.weight$")
    quantize = (lambda name: gguf.GGML_Q8_0
                if quant == "q8_0" and any(re.search(p, name) for p in _qpat)
                else None)

    def add(name, arr):
        writer.add_tensor(name, arr, quantize(name))

    add("text_embedding.weight", w(c.text_vocab_size, c.d_model))
    add("encoder.position_embeddings.weight", w(c.max_pos, c.d_model))
    for i in range(c.enc_layers):
        p = f"encoder.layers.{i}"
        add(f"{p}.norm_self.weight", g(c.d_model))
        add(f"{p}.self_attention.qkv_net.weight", w(3 * c.d_model, c.d_model))
        add(f"{p}.self_attention.o_net.weight", w(c.d_model, c.d_model))
        add(f"{p}.norm_pos_ff.weight", g(c.d_model))
        add(f"{p}.pos_ff.proj.conv.weight", w(c.d_ffn, c.d_model, c.enc_kernel))
        add(f"{p}.pos_ff.o_net.conv.weight", w(c.d_model, c.d_ffn, c.enc_kernel))
    add("encoder.norm_out.weight", g(c.d_model))

    add("decoder.position_embeddings.weight", w(c.max_pos, c.d_model))
    for i in range(c.dec_layers):
        p = f"decoder.layers.{i}"
        add(f"{p}.norm_self.weight", g(c.d_model))
        add(f"{p}.self_attention.qkv_net.weight", w(3 * c.d_model, c.d_model))
        add(f"{p}.self_attention.o_net.weight", w(c.d_model, c.d_model))
        add(f"{p}.norm_xattn_query.weight", g(c.d_model))
        add(f"{p}.norm_xattn_memory.weight", g(c.d_model))
        add(f"{p}.cross_attention.q_net.weight", w(c.d_xa, c.d_model))
        add(f"{p}.cross_attention.kv_net.weight", w(2 * c.d_xa, c.d_model))
        add(f"{p}.cross_attention.o_net.weight", w(c.d_model, c.d_xa))
        add(f"{p}.norm_pos_ff.weight", g(c.d_model))
        add(f"{p}.pos_ff.proj.conv.weight", w(c.d_ffn, c.d_model, 1))
        add(f"{p}.pos_ff.o_net.conv.weight", w(c.d_model, c.d_ffn, 1))
    add("decoder.norm_out.weight", g(c.d_model))

    for i in range(c.num_codebooks):
        add(f"audio_embeddings.{i}.weight", w(c.vocab_per_cb, c.d_model))
    add("baked_context_embedding.weight",
        w(c.num_speakers, c.context_frames * c.d_model))
    add("final_proj.weight", w(c.num_codebooks * c.vocab_per_cb, c.d_model))
    add("final_proj.bias", w(c.num_codebooks * c.vocab_per_cb))

    add("local_transformer_in_projection.weight", w(c.lt_dim, c.d_model))
    add("local_transformer_in_projection.bias", w(c.lt_dim))
    add("local_transformer.position_embeddings.weight", w(c.lt_max_pos, c.lt_dim))
    lp = "local_transformer.layers.0"
    add(f"{lp}.norm_self.weight", g(c.lt_dim))
    add(f"{lp}.self_attention.qkv_net.weight", w(3 * c.lt_dim, c.lt_dim))
    add(f"{lp}.self_attention.o_net.weight", w(c.lt_dim, c.lt_dim))
    add(f"{lp}.norm_pos_ff.weight", g(c.lt_dim))
    add(f"{lp}.pos_ff.proj.conv.weight", w(c.lt_ffn_dim, c.lt_dim, 1))
    add(f"{lp}.pos_ff.o_net.conv.weight", w(c.lt_dim, c.lt_ffn_dim, 1))
    for i in range(c.num_codebooks):
        add(f"local_transformer_out_projections.{i}.weight", w(c.vocab_per_cb, c.lt_dim))
        add(f"local_transformer_out_projections.{i}.bias", w(c.vocab_per_cb))

    writer.write(path)


def write_tiny_codec_gguf(path: str, seed: int = 0) -> None:
    c = tiny_codec_config()
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.1):
        return rng.normal(0, scale, size=shape).astype(np.float32)

    def a(n):
        return rng.uniform(0.4, 1.4, size=(1, n, 1)).astype(np.float32)

    writer = gguf.GGUFWriter()
    writer.add_metadata("general.architecture", "nano-codec")
    writer.add_metadata("codec.sample_rate", c.sample_rate)
    writer.add_metadata("codec.num_codebooks", c.num_codebooks)
    writer.add_metadata("codec.codebook_size", c.codebook_size)
    writer.add_metadata("codec.hop_length", c.hop_length)
    writer.add_metadata("codec.latent_dim", c.latent_dim)
    writer.add_metadata("codec.base_channels", c.base_channels)
    for i, (r, ch, k) in enumerate(zip(c.up_sample_rates, c.up_channels, c.up_kernels)):
        writer.add_metadata(f"codec.up_sample_rates_{i}", r)
        writer.add_metadata(f"codec.up_channels_{i}", ch)
        writer.add_metadata(f"codec.up_kernels_{i}", k)

    writer.add_tensor("dec.pre.weight", w(c.base_channels, c.latent_dim, c.pre_conv_kernel))
    writer.add_tensor("dec.pre.bias", w(c.base_channels))
    in_chs = (c.base_channels,) + c.up_channels[:-1]
    for i, (in_ch, out_ch, k_up) in enumerate(zip(in_chs, c.up_channels, c.up_kernels)):
        writer.add_tensor(f"dec.act.{i}.activation.snake_act.alpha", a(in_ch // 2))
        writer.add_tensor(f"dec.up.{i}.c.weight", w(in_ch, 1, k_up))
        writer.add_tensor(f"dec.up.{i}.c.bias", w(out_ch))
        for j, k in enumerate(c.resblock_kernel_sizes):
            for kk in range(len(c.resblock_dilations)):
                p = f"dec.rl.{i}.rb.{j}.rb.{kk}"
                writer.add_tensor(f"{p}.in_act.alpha", a(out_ch // 2))
                writer.add_tensor(f"{p}.in_conv.weight", w(out_ch, out_ch, k))
                writer.add_tensor(f"{p}.in_conv.bias", w(out_ch))
                writer.add_tensor(f"{p}.sk_act.alpha", a(out_ch // 2))
                writer.add_tensor(f"{p}.sk_conv.weight", w(out_ch, out_ch, k))
                writer.add_tensor(f"{p}.sk_conv.bias", w(out_ch))
    writer.add_tensor("dec.post_act.alpha", a(c.up_channels[-1] // 2))
    writer.add_tensor("dec.post.weight", w(1, c.up_channels[-1], c.post_conv_kernel))
    writer.add_tensor("dec.post.bias", w(1))
    for i in range(c.num_codebooks):
        writer.add_tensor(f"vq.fsqs.{i}.dim_base_index",
                          np.array(c.fsq_dim_base, np.float32).reshape(1, 4, 1))
        writer.add_tensor(f"vq.fsqs.{i}.num_levels",
                          np.array(c.fsq_levels, np.float32).reshape(1, 4, 1))
    writer.write(path)
