"""Shared test helpers: scaled-down configs that keep every structural property
(8 codebooks, special-token layout, context frames, grouped convT ratios)."""

from magpie_tts_tpu.config import CodecConfig, MagpieConfig


def tiny_magpie_config(**overrides) -> MagpieConfig:
    defaults = dict(
        d_model=64, d_ffn=128, d_head=16,
        enc_layers=2, enc_heads=4, enc_kernel=3,
        dec_layers=2, dec_sa_heads=4, dec_xa_heads=1, dec_xa_d_head=32,
        dec_kernel=1,
        lt_dim=32, lt_ffn_dim=64, lt_layers=1, lt_heads=1,
        text_vocab_size=100, num_codebooks=8, codebook_size=32, vocab_per_cb=40,
        num_speakers=2, context_frames=6,
        text_bos_id=98, text_eos_id=99,
        audio_bos_id=32, audio_eos_id=33, context_bos_id=34, context_eos_id=35,
        mask_token_id=36,
        max_dec_steps=16, min_generated_frames=2, max_pos=128,
    )
    defaults.update(overrides)
    return MagpieConfig(**defaults)


def tiny_codec_config(**overrides) -> CodecConfig:
    defaults = dict(
        hop_length=64, base_channels=64,
        up_sample_rates=(4, 2, 2, 2, 2),
        up_channels=(32, 16, 8, 4, 2),
        up_kernels=(8, 4, 4, 4, 4),
    )
    defaults.update(overrides)
    return CodecConfig(**defaults)
