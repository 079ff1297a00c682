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
    quant = p.add_mutually_exclusive_group()
    quant.add_argument("--serve-int8", action="store_true",
                       help="stream decoder weights as per-column int8 (half "
                            "the per-frame HBM traffic; ~Q8 quantization "
                            "error)")
    quant.add_argument("--serve-q8", action="store_true",
                       help="stream the checkpoint's OWN Q8_0 blocks (requires "
                            "a Q8_0 GGUF): zero requantization error at ~53%% "
                            "of the bf16 weight traffic (see docs/PARITY.md "
                            "for the numerics contract)")
    p.add_argument("--no-fused", action="store_true",
                   help="disable the fused per-frame megakernel (LT sampling + "
                        "decoder step in one pallas call); runs the separate "
                        "kernels instead. Equivalent env var: MAGPIE_NO_FUSED")
    p.add_argument("--gelu", choices=("erf", "tanh"), default=None,
                   help="GELU flavor for every FFN: 'erf' (NeMo-exact, the "
                        "default) or 'tanh' (the ggml approximation the "
                        "reference C++ engine computes) — use 'tanh' for "
                        "A/B parity runs against reference C++ dumps")
    p.add_argument("-q", "--quiet", action="store_true",
                   help="only print the output filename")
    return p


def build_serve_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="magpie-tts serve",
        description="Continuous-batching TTS server: JSONL requests on stdin "
                    "({\"id\", \"text\", optional \"speaker\"/\"seed\"} or plain "
                    "text lines), one WAV per request, JSONL results on stdout.")
    p.add_argument("-m", "--model", default="weights/magpie-357m-f32.gguf")
    p.add_argument("-c", "--codec", default="weights/nano-codec-f32.gguf")
    p.add_argument("--out-dir", default=".", help="directory for output WAVs")
    p.add_argument("--slots", type=int, default=8, help="concurrent decode slots")
    p.add_argument("--segment-frames", type=int, default=32,
                   help="frames decoded per scheduler segment")
    p.add_argument("--temp", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=80)
    p.add_argument("--dtype", choices=("float32", "bfloat16"), default="bfloat16")
    p.add_argument("--gelu", choices=("erf", "tanh"), default=None,
                   help="GELU flavor for every FFN (see `magpie-tts --help`)")
    p.add_argument("-q", "--quiet", action="store_true")
    return p


def build_warmup_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="magpie-tts warmup",
        description="Populate the persistent compilation cache for chosen "
                    "serving surfaces so deployments never pay a cold "
                    "compile: run once per (model, dtype, surface) on the "
                    "target TPU generation, then ship/mount the cache "
                    "directory alongside the weights. Every later process "
                    "deserializes executables instead of recompiling "
                    "(docs/STATUS.md cold-start table).")
    p.add_argument("-m", "--model", default="weights/magpie-357m-f32.gguf")
    p.add_argument("-c", "--codec", default="weights/nano-codec-f32.gguf")
    p.add_argument("--cache-dir", default=None,
                   help="compilation cache directory (default "
                        "$MAGPIE_COMPILATION_CACHE or "
                        "~/.cache/magpie_tts_tpu/jax_cache); this is the "
                        "artifact to ship with the weights")
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="float32")
    p.add_argument("--buckets", default=None,
                   help="comma-separated token buckets (default: engine "
                        "defaults)")
    p.add_argument("--surfaces", default="offline",
                   help="comma-separated subset of offline,fused,stream,"
                        "serve — or 'all'. offline = the plain CLI synth "
                        "path (+ codec frame buckets); fused = the "
                        "one-dispatch generate+vocode+PCM16 program; stream "
                        "= the fused streaming chunk programs; serve = the "
                        "continuous-batching segment program")
    p.add_argument("--serve-slots", type=int, default=8,
                   help="slot count for the serve surface (must match the "
                        "server's --slots to hit cache)")
    p.add_argument("--segment-frames", type=int, default=32)
    p.add_argument("--top-k", type=int, default=80)
    p.add_argument("--gelu", choices=("erf", "tanh"), default=None)
    quant = p.add_mutually_exclusive_group()
    quant.add_argument("--serve-int8", action="store_true")
    quant.add_argument("--serve-q8", action="store_true")
    p.add_argument("-q", "--quiet", action="store_true")
    return p


def warmup(argv) -> int:
    """Pre-compile every requested surface into the persistent cache."""
    args = build_warmup_parser().parse_args(argv)

    surfaces = (("offline", "fused", "stream", "serve")
                if args.surfaces.strip() == "all"
                else tuple(s.strip() for s in args.surfaces.split(",") if s.strip()))
    unknown = set(surfaces) - {"offline", "fused", "stream", "serve"}
    if unknown:
        print(f"error: unknown surface(s): {', '.join(sorted(unknown))}",
              file=sys.stderr)
        return 1

    import jax.numpy as jnp

    from .pipeline import MagpiePipeline
    from .runtime.platform import enable_compilation_cache

    def log(msg):
        if not args.quiet:
            print(msg, file=sys.stderr)

    cache_dir = enable_compilation_cache(args.cache_dir)
    log(f"warmup: compilation cache at {cache_dir or '(disabled)'}")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    buckets = (tuple(int(b) for b in args.buckets.split(","))
               if args.buckets else None)
    t0 = time.perf_counter()
    try:
        pipeline = MagpiePipeline.from_gguf(
            args.model, args.codec, compute_dtype=dtype,
            serve_int8=args.serve_int8, serve_q8=args.serve_q8,
            gelu_flavor=args.gelu)
    except FileNotFoundError as e:
        print(f"error: model file not found: {e.filename or e}", file=sys.stderr)
        return 1
    except (ValueError, OSError) as e:
        print(f"error: failed to load model: {e}", file=sys.stderr)
        return 1
    log(f"warmup: loaded in {time.perf_counter() - t0:.1f}s "
        f"(dtype={args.dtype})")

    config = pipeline.config
    dummy = [config.text_bos_id, 2, config.text_eos_id]

    def stage(name, fn):
        t = time.perf_counter()
        fn()
        log(f"warmup: {name:8s} {time.perf_counter() - t:7.1f}s")

    if "offline" in surfaces:
        stage("offline", lambda: pipeline.warmup(token_buckets=buckets,
                                                 top_k=args.top_k))
        if pipeline.codec is not None:
            stage("codec", pipeline.codec.warmup)
    if "fused" in surfaces:
        from .runtime.engine import synthesize_audio_fused

        def warm_fused():
            for bucket in (buckets or pipeline.engine.token_buckets):
                toks = dummy + [2] * (bucket - len(dummy))
                synthesize_audio_fused(pipeline.engine, pipeline.codec,
                                       toks[:bucket], temperature=0.0,
                                       top_k=args.top_k)
        if pipeline.codec is None:
            print("error: fused surface needs the codec (-c)", file=sys.stderr)
            return 1
        stage("fused", warm_fused)
    if "stream" in surfaces:
        if pipeline.codec is None:
            print("error: stream surface needs the codec (-c)", file=sys.stderr)
            return 1
        stage("stream", lambda: pipeline.warmup(streaming_path=True,
                                                token_buckets=buckets))
    if "serve" in surfaces:
        from .parallel.continuous import (ContinuousBatchingEngine,
                                          MultiChipContinuousServer)

        def warm_serve():
            # Mirror serve's engine selection so the cache entries match.
            import jax

            devices = jax.devices()
            if len(devices) > 1:
                srv = MultiChipContinuousServer(
                    pipeline.engine.weights, config, devices=devices,
                    slots_per_device=args.serve_slots, compute_dtype=dtype,
                    segment_frames=args.segment_frames)
                # One request per device: shared admission routes to the
                # least-loaded engine, so every chip compiles its programs.
                for _ in devices:
                    srv.submit(dummy)
                while srv.pending:
                    srv.step(temperature=0.0, top_k=args.top_k)
            else:
                eng = ContinuousBatchingEngine(
                    pipeline.engine.weights, config, n_slots=args.serve_slots,
                    compute_dtype=dtype, segment_frames=args.segment_frames)
                eng.submit(dummy)
                while eng.pending:
                    eng.step(temperature=0.0, top_k=args.top_k)
        stage("serve", warm_serve)

    log(f"warmup: total {time.perf_counter() - t0:.1f}s — ship {cache_dir} "
        f"with the weights (or point MAGPIE_COMPILATION_CACHE at it)")
    print(cache_dir)
    return 0


def serve(argv) -> int:
    """Continuous-batching serving loop over stdin/stdout.

    stdin is drained on a reader thread, so requests are ADMITTED WHILE
    DECODING RUNS: a request submitted after the batch started joins the
    running batch at the next segment boundary (the reference's streaming
    loop emits audio while generating, magpie.cpp:4744-4811; here the analog
    is admission-while-generating). Malformed or failing requests get an
    ``{"error": ...}`` response line instead of killing the server.
    """
    import json
    import os
    import queue
    import threading

    args = build_serve_parser().parse_args(argv)

    import jax.numpy as jnp

    from .config import MagpieConfig
    from .io.codec_weights import load_codec_weights
    from .io.magpie_weights import load_magpie_weights
    from .io.native import open_gguf
    from .io.wav import write_wav
    from .parallel.continuous import ContinuousBatchingEngine
    from .runtime.engine import CodecEngine
    from .text.tokenizer import MagpieTokenizer

    def log(msg):
        if not args.quiet:
            print(msg, file=sys.stderr)

    from .runtime.platform import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    try:
        reader = open_gguf(args.model)
        config, weights = load_magpie_weights(args.model, reader=reader)
        if args.gelu is not None:
            import dataclasses

            config = dataclasses.replace(config, gelu_flavor=args.gelu)
        tokenizer = MagpieTokenizer.from_gguf_metadata(reader.metadata)
        codec_config, codec_weights = load_codec_weights(args.codec)
    except FileNotFoundError as e:
        print(f"error: model file not found: {e.filename or e}", file=sys.stderr)
        return 1
    except (ValueError, OSError) as e:
        print(f"error: failed to load model: {e}", file=sys.stderr)
        return 1
    import jax

    devices = jax.devices()
    if len(devices) > 1:
        # Multi-chip host: one continuous engine per device behind a shared
        # admission queue (parallel/continuous.MultiChipContinuousServer) —
        # same submit/step/pending surface, n_devices x the slot capacity.
        from .parallel.continuous import MultiChipContinuousServer

        engine = MultiChipContinuousServer(
            weights, config, devices=devices, slots_per_device=args.slots,
            compute_dtype=dtype, segment_frames=args.segment_frames)
        for e in engine.engines:
            e.split_token_id = tokenizer.space_id
        log(f"serve: {len(devices)} devices x {args.slots} slots, "
            f"segment={args.segment_frames} frames")
    else:
        engine = ContinuousBatchingEngine(
            weights, config, n_slots=args.slots, compute_dtype=dtype,
            segment_frames=args.segment_frames)
        engine.split_token_id = tokenizer.space_id
        log(f"serve: {args.slots} slots, segment={args.segment_frames} frames")
    codec = CodecEngine(codec_weights, codec_config, compute_dtype=dtype)
    os.makedirs(args.out_dir, exist_ok=True)
    names = {}

    # Reader thread: stdin never blocks the decode loop, so requests are
    # admitted into the RUNNING batch (None sentinel = EOF).
    lines: "queue.Queue[str | None]" = queue.Queue()
    reader = threading.Thread(
        target=lambda: ([lines.put(ln) for ln in sys.stdin],
                        lines.put(None)),
        daemon=True)
    reader.start()

    def emit(obj):
        print(json.dumps(obj), flush=True)

    def admit(line: str) -> None:
        line = line.strip()
        if not line:
            return
        req = {"text": line}
        if line.startswith("{"):
            try:
                req = json.loads(line)
            except json.JSONDecodeError as e:
                emit({"error": f"malformed JSON request: {e}"})
                return
        rid_name = str(req.get("id", ""))
        try:
            text = req["text"]
            tokens = tokenizer.encode(text)
            rid = engine.submit(tokens,
                                speaker_id=int(req.get("speaker", 0)),
                                seed=int(req.get("seed", 0)))
        except Exception as e:  # bad field types, empty text, ...
            emit({"id": rid_name, "error": f"{type(e).__name__}: {e}"})
            return
        names[rid] = rid_name or str(rid)

    n_done = 0
    t0 = time.perf_counter()
    total_frames = 0
    eof = False
    while not eof or engine.pending:
        # Drain everything already queued; block only when idle.
        while True:
            try:
                line = lines.get(block=not engine.pending and not eof,
                                 timeout=None)
            except queue.Empty:
                break
            if line is None:
                eof = True
                break
            admit(line)
            if engine.pending:
                # Don't starve the decode loop on a firehose of requests.
                if lines.empty():
                    break
        if not engine.pending:
            continue
        finished = engine.step(temperature=args.temp, top_k=args.top_k)
        if not finished:
            continue
        try:
            audios = codec.decode_batch(list(finished.values()))
        except Exception as e:
            for rid in finished:
                emit({"id": names.get(rid, str(rid)),
                      "error": f"codec decode failed: {type(e).__name__}: {e}"})
            continue
        for (rid, codes), audio in zip(finished.items(), audios):
            path = os.path.join(args.out_dir, f"{names.get(rid, rid)}.wav")
            write_wav(path, audio, config.sample_rate)
            total_frames += codes.shape[0]
            n_done += 1
            emit({"id": names.get(rid, str(rid)), "wav": path,
                  "frames": int(codes.shape[0]),
                  "seconds": round(len(audio) / config.sample_rate, 3)})
    dt = time.perf_counter() - t0
    log(f"serve: {n_done} requests, {total_frames} frames in {dt:.2f}s "
        f"({total_frames / dt:.0f} aggregate fps)" if dt > 0 else "serve: done")
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "serve":
        return serve(argv[1:])
    if argv and argv[0] == "warmup":
        return warmup(argv[1:])
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from .io.wav import write_wav
    from .pipeline import MagpiePipeline
    from .runtime.platform import enable_compilation_cache
    from .runtime.streaming import StreamParams

    enable_compilation_cache()

    def log(msg: str):
        if not args.quiet:
            print(msg, file=sys.stderr)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    log(f"loading model {args.model} + codec {args.codec} (dtype={args.dtype})...")
    t0 = time.perf_counter()
    try:
        pipeline = MagpiePipeline.from_gguf(
            args.model, args.codec, compute_dtype=dtype,
            serve_int8=args.serve_int8, serve_q8=args.serve_q8,
            use_fused=False if args.no_fused else None,
            gelu_flavor=args.gelu)
    except FileNotFoundError as e:
        # Reference behavior: clear stderr line + exit 1 (magpie-tts.cpp:140)
        print(f"error: model file not found: {e.filename or e}", file=sys.stderr)
        return 1
    except (ValueError, OSError) as e:
        print(f"error: failed to load model: {e}", file=sys.stderr)
        return 1
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
        codes = pipeline.synthesize_codes(
            args.text, speaker_id=args.speaker, temperature=args.temp,
            top_k=args.top_k, seed=args.seed)
        # PCM16 conversion on device: half the audio transfer.
        samples = pipeline.codec.decode(codes, pcm16=True)
    elapsed = time.perf_counter() - t0

    hop = pipeline.codec.config.hop_length if pipeline.codec else 1024
    n_frames = len(samples) // hop
    fps = n_frames / elapsed if elapsed > 0 else 0.0
    rtf = (len(samples) / pipeline.config.sample_rate) / elapsed if elapsed else 0.0
    log(f"synthesized {n_frames} frames / {len(samples) / pipeline.config.sample_rate:.2f}s "
        f"audio in {elapsed:.2f}s ({fps:.1f} fps, {rtf:.1f}x real-time)")

    write_wav(args.output, samples, pipeline.config.sample_rate)
    print(args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
