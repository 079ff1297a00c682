"""Command-line interface, argv-compatible with the reference binary
(src/magpie-tts.cpp:70-134): -m/-c/-t/-o/-s/--temp/--top-k/-q plus extras."""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="magpie-tts",
        description="Magpie TTS (TPU-native JAX implementation)")
    p.add_argument("-m", "--model", default="weights/magpie-357m-f32.gguf",
                   help="path to Magpie GGUF model")
    p.add_argument("-c", "--codec", default="weights/nano-codec-f32.gguf",
                   help="path to nano-codec GGUF model")
    p.add_argument("-t", "--text", default="Hello, world!",
                   help="text to synthesize")
    p.add_argument("-o", "--output", default="output.wav",
                   help="output WAV path")
    p.add_argument("-s", "--speaker", type=int, default=0,
                   help="speaker id (0-4)")
    p.add_argument("--temp", type=float, default=0.7, help="sampling temperature")
    p.add_argument("--top-k", type=int, default=80, help="top-k for sampling")
    p.add_argument("--seed", type=int, default=0, help="sampling seed")
    p.add_argument("--stream", action="store_true",
                   help="stream sentence-by-sentence (prints chunk timing)")
    p.add_argument("--dtype", choices=("float32", "bfloat16"), default="float32",
                   help="on-device compute dtype")
    p.add_argument("--serve-int8", action="store_true",
                   help="stream decoder weights as per-column int8 (half the "
                        "per-frame HBM traffic; ~Q8 quantization error)")
    p.add_argument("-q", "--quiet", action="store_true",
                   help="only print the output filename")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from .io.wav import write_wav
    from .pipeline import MagpiePipeline
    from .runtime.streaming import StreamParams

    def log(msg: str):
        if not args.quiet:
            print(msg, file=sys.stderr)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    log(f"loading model {args.model} + codec {args.codec} (dtype={args.dtype})...")
    t0 = time.perf_counter()
    pipeline = MagpiePipeline.from_gguf(args.model, args.codec, compute_dtype=dtype,
                                        serve_int8=args.serve_int8)
    log(f"loaded in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    if args.stream:
        chunks = []
        params = StreamParams(temperature=args.temp, top_k=args.top_k,
                              speaker_id=args.speaker, seed=args.seed)
        first_audio = None
        for chunk in pipeline.stream(args.text, params):
            if first_audio is None:
                first_audio = time.perf_counter() - t0
                log(f"time to first audio: {first_audio * 1000:.0f} ms")
            chunks.append(chunk.samples)
        samples = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    else:
        samples = pipeline.synthesize(
            args.text, speaker_id=args.speaker, temperature=args.temp,
            top_k=args.top_k, seed=args.seed)
    elapsed = time.perf_counter() - t0

    n_frames = len(samples) // pipeline.config.sample_rate * 0 + \
        len(samples) // 1024
    fps = n_frames / elapsed if elapsed > 0 else 0.0
    rtf = (len(samples) / pipeline.config.sample_rate) / elapsed if elapsed else 0.0
    log(f"synthesized {n_frames} frames / {len(samples) / pipeline.config.sample_rate:.2f}s "
        f"audio in {elapsed:.2f}s ({fps:.1f} fps, {rtf:.1f}x real-time)")

    write_wav(args.output, samples, pipeline.config.sample_rate)
    print(args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
