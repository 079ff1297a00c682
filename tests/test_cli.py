"""CLI end-to-end test on synthetic GGUF checkpoints (subprocess, real argv)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from magpie_tts_tpu.io.wav import read_wav
from tests import fixtures


@pytest.fixture(scope="module")
def model_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    mpath = str(tmp / "magpie.gguf")
    cpath = str(tmp / "codec.gguf")
    fixtures.write_tiny_magpie_gguf(mpath)
    fixtures.write_tiny_codec_gguf(cpath)
    return mpath, cpath


def _run_cli(args, timeout=300):
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(Path(__file__).parent.parent)}
    import os

    env.update({k: v for k, v in os.environ.items()
                if k.startswith(("XLA_", "JAX_")) or k in ("PATH", "HOME")})
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable, "-m", "magpie_tts_tpu.cli"] + args,
                         capture_output=True, text=True, timeout=timeout, env=env)


@pytest.mark.slow
def test_cli_synthesize(model_paths, tmp_path):
    mpath, cpath = model_paths
    out = str(tmp_path / "out.wav")
    proc = _run_cli(["-m", mpath, "-c", cpath, "-t", "hello world",
                     "-o", out, "--temp", "0", "--seed", "1"])
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip().endswith("out.wav")
    samples, sr = read_wav(out)
    assert sr == 22050
    assert len(samples) > 0


@pytest.mark.slow
def test_cli_quiet_prints_only_filename(model_paths, tmp_path):
    mpath, cpath = model_paths
    out = str(tmp_path / "q.wav")
    proc = _run_cli(["-m", mpath, "-c", cpath, "-t", "hi", "-o", out, "-q",
                     "--temp", "0"])
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == out


@pytest.mark.slow
def test_cli_stream_mode(model_paths, tmp_path):
    mpath, cpath = model_paths
    out = str(tmp_path / "s.wav")
    proc = _run_cli(["-m", mpath, "-c", cpath, "-t", "one two. three four.",
                     "-o", out, "--stream", "--temp", "0"])
    assert proc.returncode == 0, proc.stderr
    assert "time to first audio" in proc.stderr
    samples, _ = read_wav(out)
    assert len(samples) > 0


@pytest.mark.slow
def test_cli_serve_is_online(model_paths, tmp_path):
    """serve must admit requests WHILE decoding: request A's result arrives
    before stdin closes, then request B (submitted after A completed) is
    admitted into the still-running server. The round-2 implementation read
    all of stdin to EOF before decoding a single frame — this test hangs (and
    times out) under that behavior."""
    import json
    import queue
    import threading

    mpath, cpath = model_paths
    out_dir = str(tmp_path / "serve_online")
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(Path(__file__).parent.parent)}
    proc = subprocess.Popen(
        [sys.executable, "-m", "magpie_tts_tpu.cli", "serve",
         "-m", mpath, "-c", cpath, "--out-dir", out_dir, "--slots", "2",
         "--segment-frames", "4", "--temp", "0", "--dtype", "float32", "-q"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, env=env)
    lines: "queue.Queue[str]" = queue.Queue()
    t = threading.Thread(
        target=lambda: [lines.put(l) for l in proc.stdout], daemon=True)
    t.start()

    def read_result(timeout=600):
        return json.loads(lines.get(timeout=timeout))

    try:
        proc.stdin.write(json.dumps({"id": "A", "text": "hello world"}) + "\n")
        proc.stdin.flush()
        res_a = read_result()          # arrives with stdin still OPEN
        assert res_a["id"] == "A" and res_a["frames"] > 0

        # Malformed request: an error line, not a dead server.
        proc.stdin.write("{not json\n")
        proc.stdin.flush()
        err = read_result(timeout=60)
        assert "error" in err

        proc.stdin.write(json.dumps({"id": "B", "text": "world hello"}) + "\n")
        proc.stdin.flush()
        res_b = read_result()
        assert res_b["id"] == "B" and res_b["frames"] > 0
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)
    assert proc.returncode == 0, proc.stderr.read()


def test_cli_serve_int8_and_q8_are_mutually_exclusive(tmp_path):
    """argparse rejects the flag combination cleanly (exit 2), before any
    model load — the engine never sees both."""
    proc = _run_cli(["-m", str(tmp_path / "x.gguf"), "-t", "hi",
                     "--serve-int8", "--serve-q8"])
    assert proc.returncode == 2
    assert "not allowed with" in proc.stderr
    assert "Traceback" not in proc.stderr


@pytest.mark.slow
def test_cli_serve_q8_requires_q8_checkpoint(model_paths, tmp_path):
    """--serve-q8 on an f32 GGUF exits 1 with a one-line error."""
    mpath, cpath = model_paths  # f32 fixtures
    proc = _run_cli(["-m", mpath, "-c", cpath, "-t", "hi",
                     "-o", str(tmp_path / "o.wav"), "--serve-q8"])
    assert proc.returncode == 1
    assert "error:" in proc.stderr and "Q8_0" in proc.stderr
    assert "Traceback" not in proc.stderr


@pytest.mark.slow
def test_cli_serve_q8_end_to_end(tmp_path):
    """--serve-q8 on a Q8_0 checkpoint synthesizes a WAV, and its greedy
    output is byte-identical to serving the same file without --serve-q8
    (on the XLA path both serve the dequantized blocks; on TPU the kernels
    stream the blocks natively — docs/PARITY.md contract)."""
    mpath = str(tmp_path / "magpie_q8.gguf")
    cpath = str(tmp_path / "codec.gguf")
    fixtures.write_tiny_magpie_gguf(mpath, quant="q8_0")
    fixtures.write_tiny_codec_gguf(cpath)
    outs = []
    for flag, name in ((["--serve-q8"], "q8.wav"), ([], "deq.wav")):
        out = str(tmp_path / name)
        proc = _run_cli(["-m", mpath, "-c", cpath, "-t", "hello world",
                         "-o", out, "--temp", "0", "--seed", "1"] + flag)
        assert proc.returncode == 0, proc.stderr
        samples, sr = read_wav(out)
        assert sr == 22050 and len(samples) > 0
        outs.append(samples)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_cli_missing_model_is_graceful(tmp_path):
    """A bad model path exits 1 with a one-line error, not a traceback."""
    proc = _run_cli(["-m", str(tmp_path / "nope.gguf"), "-t", "hi",
                     "-o", str(tmp_path / "o.wav")])
    assert proc.returncode == 1
    assert "error:" in proc.stderr
    assert "Traceback" not in proc.stderr


@pytest.mark.slow
def test_cli_serve_mode(model_paths, tmp_path):
    import json

    mpath, cpath = model_paths
    out_dir = str(tmp_path / "serve_out")
    requests = "\n".join([
        json.dumps({"id": "a", "text": "hello world"}),
        "plain text line request",
        json.dumps({"id": "c", "text": "hello hello", "seed": 3}),
    ])
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(Path(__file__).parent.parent)}
    proc = subprocess.run(
        [sys.executable, "-m", "magpie_tts_tpu.cli", "serve",
         "-m", mpath, "-c", cpath, "--out-dir", out_dir, "--slots", "2",
         "--segment-frames", "4", "--temp", "0", "--dtype", "float32", "-q"],
        input=requests, capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr
    results = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    assert {r["id"] for r in results} == {"a", "1", "c"}
    for r in results:
        samples, rate = read_wav(r["wav"])
        assert samples.shape[0] == r["frames"] * 64  # tiny-config hop length
        assert r["frames"] > 0


@pytest.mark.slow
def test_cli_warmup_command(model_paths, tmp_path):
    """`magpie-tts warmup` compiles the requested surfaces into a given
    compilation-cache dir and prints the dir (the shippable artifact)."""
    mpath, cpath = model_paths
    cache = str(tmp_path / "compile_cache")
    proc = _run_cli(["warmup", "-m", mpath, "-c", cpath,
                     "--cache-dir", cache, "--buckets", "16",
                     "--surfaces", "offline,stream"])
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == cache
    assert "offline" in proc.stderr and "stream" in proc.stderr
    assert Path(cache).is_dir()


def test_cli_warmup_rejects_unknown_surface(model_paths):
    mpath, cpath = model_paths
    proc = _run_cli(["warmup", "-m", mpath, "-c", cpath,
                     "--surfaces", "nonsense"])
    assert proc.returncode == 1
    assert "unknown surface" in proc.stderr
