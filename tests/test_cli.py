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
