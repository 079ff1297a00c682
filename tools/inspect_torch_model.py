#!/usr/bin/env python3
"""Architecture-discovery tool: instrument EVERY module of a torch model and
print the hierarchical call tree with tensor shapes.

Analog of the reference's ``inspect_inference.py`` / ``scripts/inspect_codec.py``
(instrument-everything + call-tree logging): run a forward pass of a real
PyTorch/NeMo checkpoint with a hook on every submodule, then print what was
actually CALLED — module class, parameter shapes, input/output tensor
signatures — as an indented tree. This is the first tool you run on an
unfamiliar checkpoint to decide the GGUF tensor mapping and the engine
architecture; ``tools/dump_reference_nemo.py`` then captures the per-layer
goldens once the mapping is known.

NeMo is an optional heavyweight dependency; the instrumentation works on any
``torch.nn.Module`` and is unit-tested on a plain module (tests/test_tools.py).

Usage:
    python tools/inspect_torch_model.py --model magpie.nemo --text "Hello"
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Tuple

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sig(obj) -> str:
    """Render a hook argument/output as a compact type/shape signature."""
    import torch

    if torch.is_tensor(obj):
        return f"{str(obj.dtype).replace('torch.', '')}{list(obj.shape)}"
    if isinstance(obj, (tuple, list)):
        inner = ", ".join(_sig(o) for o in obj)
        return f"({inner})" if isinstance(obj, tuple) else f"[{inner}]"
    if isinstance(obj, dict):
        inner = ", ".join(f"{k}={_sig(v)}" for k, v in obj.items())
        return f"{{{inner}}}"
    if obj is None:
        return "None"
    return type(obj).__name__


class CallRecord:
    """One module call: path, class, param shapes, in/out signatures."""

    __slots__ = ("path", "cls", "params", "inputs", "output", "n_calls")

    def __init__(self, path: str, module) -> None:
        self.path = path
        self.cls = type(module).__name__
        self.params = [(n, list(p.shape))
                       for n, p in module.named_parameters(recurse=False)]
        self.inputs: Optional[str] = None
        self.output: Optional[str] = None
        self.n_calls = 0


class ModuleInspector:
    """Hook every submodule; record call order, shapes, and call counts.

    Records are kept in FIRST-call order (the natural reading order of the
    forward pass); repeated calls (autoregressive loops) bump ``n_calls`` and
    keep the first signature, which is the shape-discovery one.
    """

    def __init__(self, model) -> None:
        self.records: Dict[str, CallRecord] = {}
        self.order: List[str] = []
        self._handles = []
        for name, module in model.named_modules():
            rec = CallRecord(name or "(root)", module)
            self.records[rec.path] = rec
            # Pre-hook: call order + input signature (pre-order — the tree
            # reads top-down as the forward actually descends). Post-hook:
            # output signature + call count.
            self._handles.append(module.register_forward_pre_hook(
                self._pre_hook_for(rec.path), with_kwargs=True))
            self._handles.append(module.register_forward_hook(
                self._post_hook_for(rec.path)))

    def _pre_hook_for(self, path: str):
        def hook(module, args, kwargs):
            rec = self.records[path]
            if rec.inputs is None:
                self.order.append(path)
                shown = args + ((kwargs,) if kwargs else ())
                rec.inputs = _sig(shown)
        return hook

    def _post_hook_for(self, path: str):
        def hook(module, args, output):
            rec = self.records[path]
            if rec.n_calls == 0:
                rec.output = _sig(output)
            rec.n_calls += 1
        return hook

    def close(self) -> None:
        for h in self._handles:
            h.remove()
        self._handles.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- reporting ------------------------------------------------------

    def tree_lines(self) -> List[str]:
        """Called modules as an indented tree, in first-call order."""
        lines = []
        for path in self.order:
            rec = self.records[path]
            depth = 0 if path == "(root)" else path.count(".") + 1
            indent = "  " * depth
            extra = f" x{rec.n_calls}" if rec.n_calls > 1 else ""
            params = "".join(f"\n{indent}    .{n}: {s}"
                             for n, s in rec.params)
            lines.append(
                f"{indent}{path} [{rec.cls}]{extra}\n"
                f"{indent}    in:  {rec.inputs}\n"
                f"{indent}    out: {rec.output}{params}")
        return lines

    def uncalled(self) -> List[Tuple[str, str]]:
        """Modules that exist in the checkpoint but never ran — dead weight
        or a path the chosen entry point does not exercise."""
        return [(r.path, r.cls) for p, r in self.records.items()
                if r.n_calls == 0 and r.path != "(root)"]


def inspect_model(model, run_fn, stream=None) -> ModuleInspector:
    """Run ``run_fn(model)`` under full instrumentation; print the call tree."""
    import torch

    stream = stream or sys.stdout
    with ModuleInspector(model) as insp, torch.no_grad():
        run_fn(model)
    for line in insp.tree_lines():
        print(line, file=stream)
    dead = insp.uncalled()
    if dead:
        print(f"\n# {len(dead)} modules never called:", file=stream)
        for path, cls in dead:
            print(f"#   {path} [{cls}]", file=stream)
    return insp


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True, help=".nemo checkpoint path")
    p.add_argument("--text", default="Hello world")
    p.add_argument("--speaker", type=int, default=0)
    p.add_argument("--device", default="cpu")
    args = p.parse_args(argv)

    from dump_reference_nemo import load_nemo_magpie

    model = load_nemo_magpie(args.model, args.device)

    def run(m):
        m.synthesize(text=args.text, speaker=args.speaker)

    inspect_model(model, run)
    return 0


if __name__ == "__main__":
    sys.exit(main())
