"""Pure-numpy reference engine for parity testing.

A 1:1 translation of the *semantics* of the Rust reference engine
(/root/reference/qwen3-inference/src/{tensor,layers,models/qwen3}.rs) used as
the golden model in tests: per-group W8A8 matmul with f32 cross-group
accumulation, round-half-away activation quant, RMSNorm ε=1e-6 inside sqrt,
RoPE base 1e6 with rotate-half pairing, per-head QK norm, GQA, SwiGLU.

Test-only code — the shipped engine is the JAX implementation.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def quantize_act(x: np.ndarray, gs: int):
    """tensor.rs:91-119 (scale 0 for zero groups, round half away)."""
    x = x.astype(F32).reshape(-1)
    groups = x.reshape(-1, gs)
    amax = np.max(np.abs(groups), axis=1)
    scale = (amax / F32(127.0)).astype(F32)
    safe = np.where(scale == 0.0, 1.0, scale).astype(F32)
    scaled = groups / safe[:, None]
    q = np.trunc(scaled + np.where(scaled >= 0, 0.5, -0.5)).astype(np.int8)
    q = np.where(scale[:, None] == 0.0, 0, q)
    return q.reshape(-1), scale


def matmul(q_x, s_x, q_w, s_w, n: int, d: int, gs: int) -> np.ndarray:
    """tensor.rs:23-62: per (row, group) int32 dot × scales, f32 sum."""
    q_x = q_x.reshape(-1, gs).astype(np.int32)  # [G, gs]
    q_w = q_w.reshape(d, -1, gs).astype(np.int32)  # [D, G, gs]
    dots = np.einsum("dgk,gk->dg", q_w, q_x)  # int32
    prod = dots.astype(F32) * s_w.reshape(d, -1).astype(F32) * s_x[None, :].astype(F32)
    # Sum groups left-to-right in f32 like the reference's sequential fold.
    out = np.zeros(d, F32)
    for g in range(prod.shape[1]):
        out += prod[:, g]
    return out


def rms_norm(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """layers.rs:100-131 (ε=1e-6 added to the mean)."""
    x = x.astype(F32)
    ssq = np.sum(x * x, dtype=F32)
    factor = F32(1.0) / np.sqrt(ssq / F32(len(x)) + F32(1e-6))
    return (w.astype(F32) * (factor * x)).astype(F32)


def rope_apply(vec: np.ndarray, pos: int, theta: float = 1e6) -> np.ndarray:
    """layers.rs:152-186: pair (x[i], x[i+d/2])."""
    half = len(vec) // 2
    out = vec.astype(F32).copy()
    for i in range(half):
        freq = F32(theta) ** F32(-i / half)
        angle = F32(pos) * freq
        c, s = np.cos(angle, dtype=F32), np.sin(angle, dtype=F32)
        x, y = out[i], out[i + half]
        out[i] = x * c - y * s
        out[i + half] = x * s + y * c
    return out


def softmax(x: np.ndarray) -> np.ndarray:
    """layers.rs:495-506."""
    x = x.astype(F32)
    e = np.exp(x - np.max(x), dtype=F32)
    return e * (F32(1.0) / np.sum(e, dtype=F32))


class RefQwen3:
    """Token-at-a-time forward (models/qwen3.rs:62-79, 131-176)."""

    def __init__(self, config, weights_np):
        """weights_np: dict with q/s arrays laid out as the TPU engine's
        native checkpoint (embed [V,dim], wq [L,AH,dim], ... norms)."""
        self.c = config
        self.w = weights_np
        c = config
        self.key_cache = np.zeros((c.n_layers, c.seq_len, c.kv_dim), F32)
        self.value_cache = np.zeros((c.n_layers, c.seq_len, c.kv_dim), F32)

    def forward(self, token: int, pos: int) -> np.ndarray:
        c, w = self.c, self.w
        gs = c.group_size
        # Embedding: dequantized row (models/qwen3.rs:240-242).
        q = w["embed.q"][token].astype(F32)
        s = w["embed.s"][token].astype(F32)
        x = (q.reshape(-1, gs) * s[:, None]).reshape(-1).astype(F32)

        for l in range(c.n_layers):
            x = self._block(l, x, pos)

        x = rms_norm(x, w["rms_final"])
        xq, xs = quantize_act(x, gs)
        logits = matmul(
            xq, xs, w["lm_head.q"], w["lm_head.s"], c.dim, c.vocab_size, gs
        )
        return logits

    def _block(self, l: int, x: np.ndarray, pos: int) -> np.ndarray:
        c, w = self.c, self.w
        gs = c.group_size
        ah, kv_dim, hd = c.all_heads_dim, c.kv_dim, c.head_dim

        # Attention block.
        xb = rms_norm(x, w["rms_att"][l])
        xq, xs = quantize_act(xb, gs)
        q = matmul(xq, xs, w["wq.q"][l], w["wq.s"][l], c.dim, ah, gs)
        k = matmul(xq, xs, w["wk.q"][l], w["wk.s"][l], c.dim, kv_dim, gs)
        v = matmul(xq, xs, w["wv.q"][l], w["wv.s"][l], c.dim, kv_dim, gs)

        # Per-head QK norm + RoPE (layers.rs:346-372); Llama has no QK-norm.
        use_qk = getattr(c, "use_qk_norm", True)
        for h in range(c.n_heads):
            sl = q[h * hd : (h + 1) * hd]
            if use_qk:
                sl = rms_norm(sl, w["q_norm"][l])
            q[h * hd : (h + 1) * hd] = rope_apply(sl, pos, c.rope_theta)
        for h in range(c.n_kv_heads):
            sl = k[h * hd : (h + 1) * hd]
            if use_qk:
                sl = rms_norm(sl, w["k_norm"][l])
            k[h * hd : (h + 1) * hd] = rope_apply(sl, pos, c.rope_theta)

        self.key_cache[l, pos] = k
        self.value_cache[l, pos] = v

        # Attention (layers.rs:374-419).
        scale = F32(1.0) / np.sqrt(F32(hd))
        out = np.zeros(ah, F32)
        kv_mul = c.n_heads // c.n_kv_heads
        for h in range(c.n_heads):
            kvh = h // kv_mul
            qh = q[h * hd : (h + 1) * hd]
            keys = self.key_cache[l, : pos + 1, kvh * hd : (kvh + 1) * hd]
            att = softmax((keys @ qh).astype(F32) * scale)
            vals = self.value_cache[l, : pos + 1, kvh * hd : (kvh + 1) * hd]
            out[h * hd : (h + 1) * hd] = att @ vals

        xq, xs = quantize_act(out, gs)
        xb2 = matmul(xq, xs, w["wo.q"][l], w["wo.s"][l], ah, c.dim, gs)
        x = (x + xb2).astype(F32)

        # FFN block (layers.rs:466-480).
        xb = rms_norm(x, w["rms_ffn"][l])
        xq, xs = quantize_act(xb, gs)
        hb = matmul(xq, xs, w["w1.q"][l], w["w1.s"][l], c.dim, c.hidden_dim, gs)
        hb2 = matmul(xq, xs, w["w3.q"][l], w["w3.s"][l], c.dim, c.hidden_dim, gs)
        hb = (hb * (F32(1.0) / (F32(1.0) + np.exp(-hb, dtype=F32))) * hb2).astype(F32)
        hq, hs = quantize_act(hb, gs)
        ffn_out = matmul(hq, hs, w["w2.q"][l], w["w2.s"][l], c.hidden_dim, c.dim, gs)
        return (x + ffn_out).astype(F32)
