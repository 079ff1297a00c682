"""End-to-end dry run of tools/acceptance.py — the day-one real-weights
checklist — on synthetic checkpoints.

The reference dump tree is produced the way it would be with a real NeMo
checkpoint: the torch oracle pipeline runs under tools/dump_reference_nemo.py
forward hooks (an identity "probe" module per golden name stands in for the
NeMo module paths), writing .bin goldens; tools/acceptance.py then loads the
same GGUFs through the production engine and must report PASS — and must
report FAIL once a golden or the expected first-frame codes are perturbed.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

# The shared fixture runs a full-decoder oracle synthesis — minutes, not
# seconds — so the whole module lives in the slow tier.
pytestmark = pytest.mark.slow

from tests import fixtures
from tests.oracle import ref_codec, ref_magpie


@pytest.fixture(scope="module")
def acceptance_setup(tmp_path_factory):
    """Tiny GGUFs + an oracle-generated reference dump tree."""
    from magpie_tts_tpu.io.codec_weights import load_codec_weights
    from magpie_tts_tpu.io.magpie_weights import load_magpie_weights
    from magpie_tts_tpu.io.native import open_gguf
    from magpie_tts_tpu.text.tokenizer import MagpieTokenizer
    from tools.dump_reference_nemo import dump_module_outputs

    root = tmp_path_factory.mktemp("acceptance")
    model_path = str(root / "magpie.gguf")
    codec_path = str(root / "codec.gguf")
    fixtures.write_tiny_magpie_gguf(model_path, seed=7)
    fixtures.write_tiny_codec_gguf(codec_path, seed=7)

    reader = open_gguf(model_path)
    config, weights = load_magpie_weights(model_path, reader=reader)
    codec_config, codec_weights = load_codec_weights(codec_path)
    tokenizer = MagpieTokenizer.from_gguf_metadata(reader.metadata)
    tokens = np.asarray(tokenizer.encode("hello world"), np.int64)

    tw = ref_magpie.TorchMagpieWeights.from_jax(weights)
    oracle_codes = ref_magpie.synthesize_greedy(
        tokens.astype(np.int32), tw, config, speaker_id=0,
        max_steps=config.max_dec_steps)
    assert len(oracle_codes), "oracle generated no frames on the tiny config"

    class Probe(torch.nn.Module):
        def forward(self, x):
            return x

    class OracleRunner(torch.nn.Module):
        """Runs the torch oracle pipeline, routing every golden through an
        identity probe submodule whose name IS the golden-dump name — the
        same forward-hook capture path a real NeMo checkpoint would use."""

        def __init__(self):
            super().__init__()
            self.names = (["tokens", "encoder_output", "decoder_output",
                           "greedy_codes", "lt_greedy_codes", "codec_latent",
                           "codec_audio"]
                          + [f"encoder_layer_{i}"
                             for i in range(config.enc_layers)]
                          + [f"decoder_layer_{i}"
                             for i in range(config.dec_layers)])
            for name in self.names:
                setattr(self, name, Probe())

        def forward(self):
            self.tokens(torch.from_numpy(tokens.astype(np.float32)))
            enc_caps: dict = {}
            enc_out = ref_magpie.run_encoder(tokens.astype(np.int32), tw,
                                             config, captures=enc_caps)
            for name, t in enc_caps.items():
                getattr(self, name)(t)

            # Teacher-forced full decoder over [context; BOS; oracle frames]
            # — the same sequence acceptance.py traces on the candidate side.
            context = ref_magpie._a(tw.jw.baked_context[0])
            bos = np.full(config.num_codebooks, config.audio_bos_id, np.int32)
            frames = [bos] + [f for f in oracle_codes]
            embs = torch.stack([
                ref_magpie.audio_frame_embedding(f, tw, config)
                for f in frames])
            dec_input = torch.cat([context, embs], dim=0)
            dec_caps: dict = {}
            dec_out = ref_magpie.run_decoder_full(dec_input, enc_out, tw,
                                                  config, captures=dec_caps)
            for name, t in dec_caps.items():
                getattr(self, name)(t)

            self.greedy_codes(
                torch.from_numpy(oracle_codes.astype(np.float32)))
            # BOS-step hidden, forbid_eos=False: matches trace_forward's
            # trace_local_transformer capture convention.
            lt_codes = ref_magpie.lt_sample_greedy(
                dec_out[config.context_frames], tw, config, forbid_eos=False)
            self.lt_greedy_codes(torch.from_numpy(lt_codes.astype(np.float32)))

            latent = ref_codec.fsq_dequantize(
                oracle_codes.T.astype(np.int32), codec_config)
            self.codec_latent(torch.from_numpy(latent.astype(np.float32)))
            audio = ref_codec.decode(oracle_codes.T.astype(np.int32),
                                     codec_weights, codec_config)
            self.codec_audio(torch.from_numpy(audio.astype(np.float32)))

    runner = OracleRunner()
    ref_dir = root / "reference"
    written = dump_module_outputs(runner, lambda m: m(), runner.names,
                                  str(ref_dir), quiet=True)
    assert sorted(written) == sorted(runner.names)
    return {"model": model_path, "codec": codec_path, "ref_dir": str(ref_dir),
            "first_frame": oracle_codes[0].tolist(), "root": root}


def test_acceptance_passes_on_matching_weights(acceptance_setup, capsys):
    from tools.acceptance import main

    s = acceptance_setup
    rc = main(["-m", s["model"], "-c", s["codec"], "-r", s["ref_dir"],
               "-t", "hello world",
               "--first-frame", ",".join(map(str, s["first_frame"]))])
    out = capsys.readouterr().out
    assert "ACCEPTANCE: PASS" in out, out
    assert rc == 0


def test_acceptance_fails_on_perturbed_golden(acceptance_setup, capsys):
    import shutil

    from magpie_tts_tpu.io.golden import read_golden, write_golden
    from tools.acceptance import main

    s = acceptance_setup
    bad_dir = s["root"] / "reference_bad"
    shutil.copytree(s["ref_dir"], bad_dir)
    # Push one encoder layer far outside the 8e-3 BASELINE tolerance.
    golden = bad_dir / "encoder_layer_0.bin"
    arr = read_golden(golden)
    write_golden(golden, arr + 0.1)
    rc = main(["-m", s["model"], "-c", s["codec"], "-r", str(bad_dir),
               "-t", "hello world"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "ACCEPTANCE: FAIL" in out
    assert "encoder_layer_0" in out


def test_acceptance_fails_on_wrong_first_frame(acceptance_setup, capsys):
    from tools.acceptance import main

    s = acceptance_setup
    wrong = [c + 1 for c in s["first_frame"]]
    rc = main(["-m", s["model"], "-c", s["codec"], "-r", s["ref_dir"],
               "-t", "hello world",
               "--first-frame", ",".join(map(str, wrong))])
    out = capsys.readouterr().out
    assert rc == 1
    assert "first_frame_codes" in out and "FAIL" in out


def test_acceptance_smoke_without_reference_dump(acceptance_setup, capsys):
    """Without -r the script still runs load -> tokens -> greedy -> audio."""
    from tools.acceptance import main

    s = acceptance_setup
    rc = main(["-m", s["model"], "-c", s["codec"], "-t", "hello world"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "ACCEPTANCE: PASS" in out
    assert "skip" in out  # golden compares are reported skipped, not silent


def test_acceptance_q8_native_stage(tmp_path, capsys):
    """On a Q8_0 checkpoint, stage 3b serves the file's own blocks and
    requires exact greedy-code equality with dequant-at-load (and an f32
    file reports the stage as skipped — see the smoke test above)."""
    from tests import fixtures
    from tools.acceptance import main

    model = str(tmp_path / "m_q8.gguf")
    fixtures.write_tiny_magpie_gguf(model, quant="q8_0")
    rc = main(["-m", model, "-t", "hello world", "--max-frames", "6"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "q8_native_codes" in out
    line = [ln for ln in out.splitlines() if "q8_native_codes" in ln][0]
    assert "ok" in line and "exactly equal" in line
