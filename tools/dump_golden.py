#!/usr/bin/env python3
"""Dump per-layer golden tensors from a GGUF checkpoint (analog of the
reference's scripts/dump_reference.py, same .bin format) so components can be
cross-checked against the reference C++ test suite or external tooling.

Usage:
    python tools/dump_golden.py -m magpie.gguf -t "Hello, world!" -o test_data/
Dumps: tokens, text embedding, encoder output, per-frame decoder hidden and the
first frame's greedy codes.
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
    p.add_argument("-t", "--text", default="Hello, world!")
    p.add_argument("-o", "--output-dir", default="test_data")
    p.add_argument("--frames", type=int, default=4,
                   help="greedy frames to generate for decoder goldens")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from magpie_tts_tpu.io.golden import write_golden
    from magpie_tts_tpu.io.magpie_weights import load_magpie_weights
    from magpie_tts_tpu.io.native import open_gguf
    from magpie_tts_tpu.models.encoder import run_encoder
    from magpie_tts_tpu.runtime.engine import MagpieEngine
    from magpie_tts_tpu.text.tokenizer import MagpieTokenizer

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    reader = open_gguf(args.model)
    config, weights = load_magpie_weights(args.model, reader=reader)
    tokenizer = MagpieTokenizer.from_gguf_metadata(reader.metadata)

    tokens = tokenizer.encode(args.text)
    print(f"tokens ({len(tokens)}): {tokens}", file=sys.stderr)
    write_golden(out / "tokens.bin", np.asarray(tokens, np.float32))

    tok = jnp.asarray(tokens, jnp.int32)
    emb = weights.text_emb[tok]
    # reference dumps are [seq, d_model] PyTorch order
    write_golden(out / "text_embedding.bin", np.asarray(emb))

    enc_out = run_encoder(tok, weights, config)
    write_golden(out / "encoder_output.bin", np.asarray(enc_out))

    engine = MagpieEngine(weights, config, token_buckets=(len(tokens),))
    stream = engine.begin_stream(tokens)
    codes, _done = engine.decode_chunk(stream, n_frames=args.frames,
                                       temperature=0.0)
    write_golden(out / "greedy_codes.bin", codes.astype(np.float32))
    print(f"dumped goldens to {out}/ (first-frame codes: {codes[0].tolist() if len(codes) else []})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
