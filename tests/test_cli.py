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


def test_cli_quiet_prints_only_filename(model_paths, tmp_path):
    mpath, cpath = model_paths
    out = str(tmp_path / "q.wav")
    proc = _run_cli(["-m", mpath, "-c", cpath, "-t", "hi", "-o", out, "-q",
                     "--temp", "0"])
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == out


def test_cli_stream_mode(model_paths, tmp_path):
    mpath, cpath = model_paths
    out = str(tmp_path / "s.wav")
    proc = _run_cli(["-m", mpath, "-c", cpath, "-t", "one two. three four.",
                     "-o", out, "--stream", "--temp", "0"])
    assert proc.returncode == 0, proc.stderr
    assert "time to first audio" in proc.stderr
    samples, _ = read_wav(out)
    assert len(samples) > 0


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
