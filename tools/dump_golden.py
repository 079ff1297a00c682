#!/usr/bin/env python3
"""Dump per-layer golden tensors from a GGUF checkpoint (analog of the
reference's scripts/dump_reference.py + dump_decoder_reference.py, same .bin
format) so any divergence against the reference or an earlier build can be
localized to a single layer with tools/verify_golden.py.

Usage:
    python tools/dump_golden.py -m magpie.gguf [-c codec.gguf] \
        -t "Hello, world!" -o test_data/

Dumps: tokens, per-layer encoder hiddens, XA K/V, per-layer full-sequence
decoder hiddens, final projection, per-codebook LT logits + greedy codes,
N greedy frames, and (with -c) FSQ latent + per-stage codec outputs + audio.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-c", "--codec", default=None,
                   help="codec GGUF; enables per-stage codec dumps")
    p.add_argument("-t", "--text", default="Hello, world!")
    p.add_argument("-o", "--output-dir", default="test_data")
    p.add_argument("-s", "--speaker", type=int, default=0)
    p.add_argument("--frames", type=int, default=4,
                   help="greedy frames to generate for decoder/codec goldens")
    args = p.parse_args()

    import jax.numpy as jnp

    from magpie_tts_tpu.io import trace_forward as tf
    from magpie_tts_tpu.io.golden import write_golden
    from magpie_tts_tpu.io.magpie_weights import load_magpie_weights
    from magpie_tts_tpu.io.native import open_gguf
    from magpie_tts_tpu.runtime.engine import MagpieEngine
    from magpie_tts_tpu.text.tokenizer import MagpieTokenizer

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    reader = open_gguf(args.model)
    config, weights = load_magpie_weights(args.model, reader=reader)
    tokenizer = MagpieTokenizer.from_gguf_metadata(reader.metadata)

    tokens = tokenizer.encode(args.text)
    print(f"tokens ({len(tokens)}): {tokens}", file=sys.stderr)
    dumps = {"tokens": np.asarray(tokens, np.float32)}

    tok = jnp.asarray(tokens, jnp.int32)
    dumps.update(tf.trace_encoder(tok, weights, config))
    enc_out = jnp.asarray(dumps["encoder_output"])

    # Greedy frames from the production engine (cached path) — also the
    # decoder/codec trace input.
    engine = MagpieEngine(weights, config, token_buckets=(len(tokens),))
    stream = engine.begin_stream(tokens, speaker_id=args.speaker)
    codes, _done = engine.decode_chunk(stream, n_frames=args.frames,
                                       temperature=0.0)
    dumps["greedy_codes"] = codes.astype(np.float32)

    dec = tf.trace_decoder(enc_out, weights, config, speaker_id=args.speaker,
                           frames=codes)
    dumps.update(dec)
    hidden = jnp.asarray(dec["decoder_output"][config.context_frames],
                         weights.text_emb.dtype)  # BOS-step hidden
    dumps.update(tf.trace_local_transformer(hidden, weights, config))

    if args.codec and len(codes):
        from magpie_tts_tpu.io.codec_weights import load_codec_weights

        codec_config, codec_weights = load_codec_weights(args.codec)
        dumps.update(tf.trace_codec(codes, codec_weights, codec_config))

    for name, arr in dumps.items():
        write_golden(out / f"{name}.bin", arr)
    print(f"dumped {len(dumps)} goldens to {out}/ "
          f"(first-frame codes: {codes[0].tolist() if len(codes) else []})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
