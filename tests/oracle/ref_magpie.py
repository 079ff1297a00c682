"""Independent PyTorch oracle for the Magpie model.

This is the test-time ground truth, playing the role of the reference repo's
golden PyTorch dumps (its weights are not distributable). It is deliberately
written with different primitives and layouts than the JAX implementation:
PyTorch [out, in] weights, F.conv1d / F.layer_norm, per-head Python loops in
attention — so a layout or semantics bug in the JAX path cannot cancel out here.

All functions take a `TorchMagpieWeights` converted from the JAX pytree.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List

import numpy as np
import torch
import torch.nn.functional as F


def _t(w) -> torch.Tensor:
    """JAX [in, out] -> torch [out, in]."""
    return torch.from_numpy(np.asarray(w).T.copy()).float()


def _a(w) -> torch.Tensor:
    return torch.from_numpy(np.asarray(w).copy()).float()


@dataclass
class TorchMagpieWeights:
    jw: object  # the MagpieWeights pytree (host numpy access via np.asarray)

    @classmethod
    def from_jax(cls, weights):
        return cls(jw=weights)


def layer_norm(x: torch.Tensor, w: torch.Tensor, eps: float) -> torch.Tensor:
    return F.layer_norm(x, (x.shape[-1],), weight=w, bias=None, eps=eps)


def mha(x: torch.Tensor, qkv_w: torch.Tensor, out_w: torch.Tensor,
        n_heads: int, causal: bool) -> torch.Tensor:
    """x: [T, d]; qkv_w: torch [3d, d]; out_w: [d, d]. Per-head loop."""
    T, d = x.shape
    d_head = d // n_heads
    qkv = x @ qkv_w.T  # [T, 3d]
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    outs: List[torch.Tensor] = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        scores = qh @ kh.T / math.sqrt(d_head)
        if causal:
            mask = torch.triu(torch.ones(T, T, dtype=torch.bool), diagonal=1)
            scores = scores.masked_fill(mask, float("-inf"))
        probs = torch.softmax(scores, dim=-1)
        outs.append(probs @ vh)
    return torch.cat(outs, dim=-1) @ out_w.T


def _gelu_mode(config) -> str:
    """torch F.gelu approximate= string for the config's gelu_flavor."""
    return "tanh" if getattr(config, "gelu_flavor", "erf") == "tanh" else "none"


def conv_ffn(x: torch.Tensor, proj_w: torch.Tensor, out_w: torch.Tensor,
             gelu_approximate: str = "none") -> torch.Tensor:
    """Causal Conv1d -> GELU -> causal Conv1d. x: [T, d]; weights torch [out, in, k]."""
    k = proj_w.shape[-1]
    xc = x.T.unsqueeze(0)  # [1, d, T]
    h = F.conv1d(F.pad(xc, (k - 1, 0)), proj_w)
    h = F.gelu(h, approximate=gelu_approximate)
    k2 = out_w.shape[-1]
    out = F.conv1d(F.pad(h, (k2 - 1, 0)), out_w)
    return out.squeeze(0).T


def cross_attention(q_in: torch.Tensor, mem: torch.Tensor, q_w: torch.Tensor,
                    kv_w: torch.Tensor, out_w: torch.Tensor, n_heads: int,
                    d_head: int) -> torch.Tensor:
    """q_in: [Tq, d] (normed); mem: [Tk, d] (normed)."""
    d_xa = n_heads * d_head
    q = q_in @ q_w.T               # [Tq, d_xa]
    kv = mem @ kv_w.T              # [Tk, 2*d_xa]
    k, v = kv[:, :d_xa], kv[:, d_xa:]
    outs = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        scores = q[:, sl] @ k[:, sl].T / math.sqrt(d_head)
        probs = torch.softmax(scores, dim=-1)
        outs.append(probs @ v[:, sl])
    return torch.cat(outs, dim=-1) @ out_w.T


def run_encoder(tokens: np.ndarray, weights, config,
                captures: dict = None) -> torch.Tensor:
    """``captures``: optional dict that receives per-layer intermediates under
    the golden-dump names (io/trace_forward.py naming) for acceptance tests."""
    jw = weights.jw
    enc = jw.encoder
    x = _a(jw.text_emb)[torch.from_numpy(tokens).long()]
    x = x + _a(enc.pos_emb)[: len(tokens)]
    for l in range(config.enc_layers):
        h = layer_norm(x, _a(enc.norm_self[l]), config.eps)
        x = x + mha(h, _t(enc.qkv[l]), _t(enc.sa_out[l]), config.enc_heads, causal=True)
        h = layer_norm(x, _a(enc.norm_ff[l]), config.eps)
        # JAX stores conv-ffn as [k, in, out]; torch conv1d wants [out, in, k].
        proj_w = torch.from_numpy(np.transpose(np.asarray(enc.ff_proj[l]), (2, 1, 0)).copy()).float()
        out_w = torch.from_numpy(np.transpose(np.asarray(enc.ff_out[l]), (2, 1, 0)).copy()).float()
        x = x + conv_ffn(h, proj_w, out_w, gelu_approximate=_gelu_mode(config))
        if captures is not None:
            captures[f"encoder_layer_{l}"] = x.clone()
    out = layer_norm(x, _a(enc.norm_out), config.eps)
    if captures is not None:
        captures["encoder_output"] = out.clone()
    return out


def run_decoder_full(dec_input: torch.Tensor, enc_out: torch.Tensor,
                     weights, config, captures: dict = None) -> torch.Tensor:
    """dec_input: [T, d] WITHOUT position embeddings (added here, offset 0)."""
    jw = weights.jw
    dec = jw.decoder
    T = dec_input.shape[0]
    x = dec_input + _a(dec.pos_emb)[:T]
    for l in range(config.dec_layers):
        h = layer_norm(x, _a(dec.norm_self[l]), config.eps)
        x = x + mha(h, _t(dec.qkv[l]), _t(dec.sa_out[l]), config.dec_sa_heads, causal=True)
        qn = layer_norm(x, _a(dec.norm_xa_q[l]), config.eps)
        mn = layer_norm(enc_out, _a(dec.norm_xa_mem[l]), config.eps)
        x = x + cross_attention(qn, mn, _t(dec.xa_q[l]), _t(dec.xa_kv[l]),
                                _t(dec.xa_out[l]), config.dec_xa_heads,
                                config.dec_xa_d_head)
        h = layer_norm(x, _a(dec.norm_ff[l]), config.eps)
        proj_w = _t(dec.ff_proj[l]).unsqueeze(-1)  # [out, in, 1]
        out_w = _t(dec.ff_out[l]).unsqueeze(-1)
        x = x + conv_ffn(h, proj_w, out_w, gelu_approximate=_gelu_mode(config))
        if captures is not None:
            captures[f"decoder_layer_{l}"] = x.clone()
    out = layer_norm(x, _a(dec.norm_out), config.eps)
    if captures is not None:
        captures["decoder_output"] = out.clone()
    return out


def audio_frame_embedding(codes: np.ndarray, weights, config) -> torch.Tensor:
    jw = weights.jw
    total = torch.zeros(config.d_model)
    for cb in range(config.num_codebooks):
        total = total + _a(jw.audio_emb[cb])[int(codes[cb])]
    return total / config.num_codebooks


def lt_sample_greedy(decoder_hidden: torch.Tensor, weights, config,
                     forbid_eos: bool) -> np.ndarray:
    """Greedy local-transformer sampling of all codebooks (reference algorithm:
    grow the projected sequence, rerun the single causal layer each time)."""
    jw = weights.jw
    lt = jw.lt
    in_w, in_b = _t(lt.in_proj_w), _a(lt.in_proj_b)
    seq = [(decoder_hidden @ in_w.T + in_b)]
    codes = np.zeros(config.num_codebooks, dtype=np.int32)
    forbidden = [config.audio_bos_id] + list(range(config.audio_bos_id + 2,
                                                   config.audio_bos_id + 8))
    if forbid_eos:
        forbidden.append(config.audio_eos_id)
    for cb in range(config.num_codebooks):
        x = torch.stack(seq)  # [cb+1, lt_dim]
        x = x + _a(lt.pos_emb)[: len(seq)]
        h = layer_norm(x, _a(lt.norm_self), config.eps)
        x = x + mha(h, _t(lt.qkv), _t(lt.sa_out), config.lt_heads, causal=True)
        h = layer_norm(x, _a(lt.norm_ff), config.eps)
        x = x + conv_ffn(h, _t(lt.ff_proj).unsqueeze(-1), _t(lt.ff_out).unsqueeze(-1),
                         gelu_approximate=_gelu_mode(config))
        hidden = x[-1]
        logits = hidden @ _t(lt.out_proj_w[cb]).T + _a(lt.out_proj_b[cb])
        for tok in forbidden:
            if tok < config.vocab_per_cb:
                logits[tok] = float("-inf")
        code = int(torch.argmax(logits))
        codes[cb] = code
        if cb < config.num_codebooks - 1:
            emb = _a(jw.audio_emb[cb])[code]
            seq.append(emb @ in_w.T + in_b)
    return codes


def synthesize_greedy(tokens: np.ndarray, weights, config, speaker_id: int = 0,
                      max_steps: int = None) -> np.ndarray:
    """Full greedy pipeline via the uncached "standard" path
    (reference magpie.cpp:2457-2743). Returns codes [n_frames, 8]."""
    jw = weights.jw
    max_steps = max_steps or config.max_dec_steps
    enc_out = run_encoder(tokens, weights, config)
    context = _a(jw.baked_context[speaker_id])  # [T_ctx, d]

    frames = [np.full(config.num_codebooks, config.audio_bos_id, np.int32)]
    out_frames = []
    for step in range(max_steps):
        embs = [audio_frame_embedding(f, weights, config) for f in frames]
        dec_input = torch.cat([context, torch.stack(embs)], dim=0)
        dec_out = run_decoder_full(dec_input, enc_out, weights, config)
        hidden = dec_out[-1]
        forbid_eos = step < config.min_generated_frames
        codes = lt_sample_greedy(hidden, weights, config, forbid_eos)
        if np.any(codes == config.audio_eos_id):
            break
        out_frames.append(codes)
        frames.append(codes)
    return np.stack(out_frames) if out_frames else np.zeros((0, config.num_codebooks), np.int32)
