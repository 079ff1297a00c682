#!/usr/bin/env python3
"""Diff two golden-dump directories layer by layer.

Counterpart of tools/dump_golden.py: given a reference dump tree (from the
reference engine, a PyTorch/NeMo hook dump in the same .bin layout, or an
earlier build of this framework) and a candidate tree, reports max/mean abs
diff per tensor against per-component tolerances and exits nonzero on any
failure — the reference test suite's per-layer golden discipline (SURVEY §4)
as one command.

Usage:
    python tools/verify_golden.py reference_dir candidate_dir [--tol NAME=TOL]

Default tolerances follow the reference's achieved parity bars
(BASELINE.md accuracy table): encoder 8e-3, decoder 3e-3, final proj 1e-6,
LT codes exact, FSQ exact, codec 4.5e-3.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (prefix, max-abs-diff tolerance); first match wins. Exact (0.0) for integer
# dumps stored as f32.
DEFAULT_TOLERANCES = [
    ("tokens", 0.0),
    ("greedy_codes", 0.0),
    ("lt_greedy_codes", 0.0),
    ("codec_latent", 0.0),          # FSQ is exact integer math
    ("text_embedding", 1e-6),
    ("encoder_input", 1e-6),
    ("encoder", 8e-3),              # reference encoder bar (STATUS.md:85-91)
    ("xa_", 3e-3),
    ("decoder_input", 1e-5),
    ("decoder", 3e-3),              # reference decoder bar (STATUS.md:113-116)
    ("final_proj", 1e-4),
    ("lt_logits", 1e-3),
    ("codec_audio", 4.5e-3),        # reference codec bar (STATUS.md:164-167)
    ("codec", 1e-2),                # intermediate stages, pre-tanh scale
]


def tolerance_for(name: str, overrides) -> float:
    for prefix, tol in overrides + DEFAULT_TOLERANCES:
        if name.startswith(prefix):
            return tol
    return 1e-3


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("reference_dir")
    ap.add_argument("candidate_dir")
    ap.add_argument("--tol", action="append", default=[],
                    metavar="PREFIX=TOL",
                    help="override tolerance for dumps matching PREFIX")
    ap.add_argument("-q", "--quiet", action="store_true",
                    help="only print failures and the summary")
    args = ap.parse_args()

    from magpie_tts_tpu.io.golden import read_golden

    overrides = []
    for spec in args.tol:
        prefix, _, tol = spec.partition("=")
        overrides.append((prefix, float(tol)))

    ref_dir, cand_dir = Path(args.reference_dir), Path(args.candidate_dir)
    ref_files = sorted(p.stem for p in ref_dir.glob("*.bin"))
    if not ref_files:
        print(f"verify_golden: no .bin files in {ref_dir}", file=sys.stderr)
        return 2

    n_fail = n_missing = 0
    for name in ref_files:
        cand = cand_dir / f"{name}.bin"
        if not cand.exists():
            print(f"MISSING  {name}")
            n_missing += 1
            continue
        a = read_golden(ref_dir / f"{name}.bin")
        b = read_golden(cand)
        if a.shape != b.shape:
            print(f"SHAPE    {name}: {a.shape} vs {b.shape}")
            n_fail += 1
            continue
        diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
        mx, mean = float(diff.max()) if diff.size else 0.0, \
            float(diff.mean()) if diff.size else 0.0
        tol = tolerance_for(name, overrides)
        ok = mx <= tol
        if not ok:
            n_fail += 1
        if not ok or not args.quiet:
            print(f"{'ok' if ok else 'FAIL':7s}  {name:28s} "
                  f"max {mx:.3e}  mean {mean:.3e}  (tol {tol:g})")

    extra = sorted(set(p.stem for p in cand_dir.glob("*.bin")) - set(ref_files))
    if extra and not args.quiet:
        print(f"note: candidate-only dumps ignored: {', '.join(extra)}")
    print(f"verify_golden: {len(ref_files) - n_fail - n_missing}/"
          f"{len(ref_files)} ok, {n_fail} failed, {n_missing} missing")
    return 1 if (n_fail or n_missing) else 0


if __name__ == "__main__":
    sys.exit(main())
