"""Whole-stack decode megakernel: every layer of a decode step in ONE
pallas_call.

Motivation (measured on v5e, scripts/boundary_probe.py): each pallas_call
boundary costs ~5-7 µs of pipeline fill/drain — the weight DMA stream
stops at the end of one kernel and restarts cold in the next.  The decode
path ran 5 kernels per layer (4 matmuls + flash attention); at 36 layers
that is ~1 ms of a ~11.5 ms step, and the XLA glue between them (QK-norm,
RoPE, reshapes) adds more.  This kernel runs the ENTIRE layer stack as one
sequential grid:

    grid = (n_layers,)           # one grid step per layer
    scratch: x_vec [B, dim] f32  # residual stream, persists across steps

Per grid step (= layer):  RMSNorm → wqkv stream → QK-norm+RoPE → flash
attention over the KV cache (position-bounded, double-buffered page DMAs)
→ wo stream (+residual) → RMSNorm → w13 stream → SwiGLU → w2 stream
(+residual).  Weight tiles stream HBM→VMEM through per-matrix
double-buffered scratch with a global tile counter; the FIRST tile of each
phase is prefetched during the PREVIOUS phase (and the next layer's first
wqkv tile during w2), so the weight stream never goes idle across phase or
layer boundaries — the property the per-matrix kernels could not have.

Numerics match the fused qmatmul path: bf16 dequant (codes exact in bf16),
bf16 dot inputs, f32 accumulation, f32 residual stream (the unfused path
carries bf16 residuals; parity tests use bf16-level tolerances).

Replaces the reference inner loops tensor.rs:23-62 + layers.rs:287-420 for
the single-stream decode case (S=1, dense cache).  B is currently limited
to 1 (the flagship single-stream benchmark shape); batched decode keeps
the per-matrix kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _pick_blk

# ~Codes bytes per weight tile. 1-2 MB tiles with the boundary-free stream
# measured as fast as 3 MB tiles, and keep the double-buffered VMEM
# footprint of four matrices + attention under the scoped limit.
import os as _os

_TILE_BYTES = int(_os.environ.get("QWEN3_TPU_MEGA_TILE_BYTES", 2 * 1024 * 1024))
_VMEM_LIMIT = int(_os.environ.get("QWEN3_TPU_MEGA_VMEM_LIMIT", 100 * 1024 * 1024))


def _mk_tiles(n: int, d: int, g: int) -> tuple[int, int] | None:
    """(tn, td) dividing (n, d): tn%g==0 with 8-aligned group rows (or
    tn==n), td%256==0 (or td==d, 128-aligned), codes ≤ _TILE_BYTES."""
    tn_cands = [
        c
        for c in range(g, n + 1, g)
        if n % c == 0 and ((c // g) % 8 == 0 or c == n) and c <= 1024
    ] or ([n] if n % g == 0 else [])
    td_cands = [c for c in range(256, d + 1, 256) if d % c == 0 and c <= 4096]
    if not td_cands and d % 128 == 0:
        td_cands = [d]
    best = None
    for tn in tn_cands:
        for td in td_cands:
            if tn * td > _TILE_BYTES:
                continue
            key = (tn * td, -((n // tn) * (d // td)))
            if best is None or key > best[0]:
                best = (key, tn, td)
    return None if best is None else (best[1], best[2])


def megakernel_supported(config, t: int, dtype) -> bool:
    """Static dims check for the whole-stack decode kernel."""
    import os

    if os.environ.get("QWEN3_TPU_DISABLE_MEGAKERNEL", "0") == "1":
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if config.head_dim != 128 or config.n_heads % config.n_kv_heads:
        return False
    if _pick_blk(t) is None:
        return False
    g = config.group_size
    dims = [
        (config.dim, config.all_heads_dim + 2 * config.kv_dim),
        (config.all_heads_dim, config.dim),
        (config.dim, 2 * config.hidden_dim),
        (config.hidden_dim, config.dim),
    ]
    for n, d in dims:
        tiles = _mk_tiles(n, d, g)
        # Mosaic requires the scale block's sublane extent (groups per
        # tile) 8-aligned for the HBM slice; tiny test dims only run in
        # interpret mode.
        if tiles is None or (tiles[0] // g) % 8 != 0:
            return False
    return True


def head_phase_supported(config, v_pad: int) -> bool:
    """Whether the classifier matmul can run as the megakernel's final
    phase (streamed right behind the last w2 tiles)."""
    tiles = _mk_tiles(config.dim, v_pad, config.group_size)
    return tiles is not None and (tiles[0] // config.group_size) % 8 == 0


def _dequant(codes, scales, g: int):
    """int8 [tn, td] × group scales [tn//g, td] → bf16 [tn, td]."""
    tg = codes.shape[0] // g
    sc = jnp.broadcast_to(
        scales.astype(jnp.bfloat16)[:, None, :], (tg, g, codes.shape[1])
    ).reshape(codes.shape)
    return codes.astype(jnp.bfloat16) * sc


def _mk_kernel(config, tiles, blk, eps, cache_dtype, n_layers, v_pad=None):
    dim = config.dim
    ah = config.all_heads_dim
    kvd = config.kv_dim
    hidden = config.hidden_dim
    n_heads, n_kv, hd = config.n_heads, config.n_kv_heads, config.head_dim
    kv_mul = n_heads // n_kv
    g = config.group_size
    scale = 1.0 / (hd**0.5)
    include_head = v_pad is not None

    # Per-matrix static tile plans: (tn, td, K, I).
    mats = [
        ("wqkv", (dim, ah + 2 * kvd)),
        ("wo", (ah, dim)),
        ("w13", (dim, 2 * hidden)),
        ("w2", (hidden, dim)),
    ]
    if include_head:
        mats.append(("head", (dim, v_pad)))
    plans = {}
    for name, (n, d) in mats:
        tn, td = tiles[name]
        plans[name] = (tn, td, n // tn, d // td)
    mat_names = [m[0] for m in mats]

    def kernel(
        # scalar prefetch
        pos_ref,  # [2] int32: (position, write gate)
        # inputs
        x_ref,  # [1, dim] f32
        ra_ref,  # [1, 1, dim] f32  (rms_att, layer block)
        rf_ref,  # [1, 1, dim] f32  (rms_ffn)
        qn_ref,  # [1, 1, hd] f32
        kn_ref,  # [1, 1, hd] f32
        cos_ref,  # [1, hd//2] f32
        sin_ref,  # [1, hd//2] f32
        *rest,
    ):
        it = iter(rest)
        rfin_ref = next(it) if include_head else None  # [1, dim] rms_final
        wqkv_q, wqkv_s = next(it), next(it)  # HBM (ANY)
        wo_q, wo_s = next(it), next(it)
        w13_q, w13_s = next(it), next(it)
        w2_q, w2_s = next(it), next(it)
        head_q, head_s = (next(it), next(it)) if include_head else (None, None)
        kc_ref, vc_ref = next(it), next(it)  # [L, 1, n_kv, T, hd] cache
        # outputs
        xo_ref = next(it)  # [1, dim] f32
        kco_ref = next(it)  # [L, 1, n_kv, T, hd] — ALIASES kc_ref
        vco_ref = next(it)  # (in-place row write at the step position)
        logits_ref = next(it) if include_head else None  # [1, v_pad] f32
        # scratch (persists across grid steps) — flat, regrouped below
        scr = list(it)
        nm = len(mat_names)
        (x_vec, act, qkv, gu, acc) = scr[:5]
        wbufs, sbufs = scr[5 : 5 + nm], scr[5 + nm : 5 + 2 * nm]
        wsems = scr[5 + 2 * nm : 5 + 3 * nm]
        ssems = scr[5 + 3 * nm : 5 + 4 * nm]
        kbuf, vbuf, ksem, vsem = scr[5 + 4 * nm : 5 + 4 * nm + 4]
        kblk, vblk, kisem, visem, kwsem, vwsem = scr[
            5 + 4 * nm + 4 : 5 + 4 * nm + 10
        ]

        layer = pl.program_id(0)
        p = pos_ref[0]
        write_ok = pos_ref[1]

        # ---- in-place K/V row write, part 1: block read-in ----
        # Mosaic HBM slices must be sublane-tile aligned, so a single row
        # at a dynamic position can't be DMA'd directly; instead the
        # tile-aligned row block containing ``p`` is read in, the new row
        # merged in VMEM after attention, and the block written back.
        row_blk = kblk.shape[1]
        pb = (p // row_blk) * row_blk
        kv_in = (
            pltpu.make_async_copy(
                kc_ref.at[layer, 0, :, pl.ds(pb, row_blk), :], kblk, kisem
            ),
            pltpu.make_async_copy(
                vc_ref.at[layer, 0, :, pl.ds(pb, row_blk), :], vblk, visem
            ),
        )

        @pl.when(write_ok != 0)
        def _():
            for c in kv_in:
                c.start()

        bufs = dict(zip(mat_names, zip(wbufs, sbufs, wsems, ssems)))
        refs = {
            "wqkv": (wqkv_q, wqkv_s),
            "wo": (wo_q, wo_s),
            "w13": (w13_q, w13_s),
            "w2": (w2_q, w2_s),
        }
        if include_head:
            refs["head"] = (head_q, head_s)

        def tile_copies(name, lyr, t, slot):
            tn, td, K, I = plans[name]
            wq_ref, ws_ref = refs[name]
            wbuf, sbuf, wsem, ssem = bufs[name]
            i = t // K
            k = jax.lax.rem(t, K)
            tg = tn // g
            cw = pltpu.make_async_copy(
                wq_ref.at[lyr, pl.ds(k * tn, tn), pl.ds(i * td, td)],
                wbuf.at[slot],
                wsem.at[slot],
            )
            cs = pltpu.make_async_copy(
                ws_ref.at[lyr, pl.ds(k * tg, tg), pl.ds(i * td, td)],
                sbuf.at[slot],
                ssem.at[slot],
            )
            return cw, cs

        def start_tile(name, lyr, t, slot):
            cw, cs = tile_copies(name, lyr, t, slot)
            cw.start()
            cs.start()

        def stream_phase(
            name, src_ref, dest, dest_residual, next_starts, lyr=None,
            dest_rows=False,
        ):
            """Run one matmul phase: dest[:, i·td] ← Σ_k x[k·tn] · W tile.

            ``next_starts``: list of thunks issuing the NEXT phase's first
            DMAs, called once at the loop's final tile so the following
            stream is in flight before this one drains.  ``lyr`` overrides
            the weight stack's layer index (the classifier is [1, N, D]).
            """
            tn, td, K, I = plans[name]
            tg = tn // g
            wbuf, sbuf, wsem, ssem = bufs[name]
            lyr = layer if lyr is None else lyr

            def body(t, _):
                slot = jax.lax.rem(t, 2)
                i = t // K
                k = jax.lax.rem(t, K)

                @pl.when(t + 1 < K * I)
                def _():
                    start_tile(name, lyr, t + 1, 1 - slot)

                @pl.when(t + 1 == K * I)
                def _():
                    for s in next_starts:
                        s()

                cw, cs = tile_copies(name, lyr, t, slot)
                cw.wait()
                cs.wait()

                xt = src_ref[:, pl.ds(k * tn, tn)].astype(jnp.bfloat16)
                wf = _dequant(wbuf[slot], sbuf[slot], g)
                part = jax.lax.dot_general(
                    xt, wf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [1, td]

                @pl.when(k == 0)
                def _():
                    acc[:, pl.ds(0, td)] = jnp.zeros((1, td), jnp.float32)

                acc[:, pl.ds(0, td)] += part

                @pl.when(k == K - 1)
                def _():
                    block = acc[:, pl.ds(0, td)]
                    if dest_rows:
                        # dest is [I, td]: a dynamic SUBLANE store.  (A
                        # dynamic-lane store into a very wide vector —
                        # the padded vocab — measured ~15 µs each; the
                        # row layout makes it free.  Caller reshapes.)
                        dest[pl.ds(i, 1), :] = block
                    elif dest_residual:
                        dest[:, pl.ds(i * td, td)] += block
                    else:
                        dest[:, pl.ds(i * td, td)] = block

                return 0

            jax.lax.fori_loop(0, K * I, body, 0, unroll=False)

        # ---- layer entry: residual stream init, att-norm ----
        @pl.when(layer == 0)
        def _():
            x_vec[:] = x_ref[:]
            start_tile("wqkv", 0, 0, 0)

        xf = x_vec[:]
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
        act[:, pl.ds(0, dim)] = xf * inv * ra_ref[0]

        # ---- wqkv stream (prefetches attention block 0 + wo tile 0) ----
        def start_attn_dmas():
            @pl.when(p > 0)
            def _():
                start_kv(0, 0)

            start_tile("wo", layer, 0, 0)

        def start_kv(j, slot):
            pltpu.make_async_copy(
                kc_ref.at[layer, 0, :, pl.ds(j * blk, blk), :],
                kbuf.at[slot], ksem.at[slot],
            ).start()
            pltpu.make_async_copy(
                vc_ref.at[layer, 0, :, pl.ds(j * blk, blk), :],
                vbuf.at[slot], vsem.at[slot],
            ).start()

        stream_phase("wqkv", act, qkv, False, [start_attn_dmas])

        # ---- QK-norm + RoPE ----
        q = qkv[:, pl.ds(0, ah)].reshape(n_heads, hd)
        k_new = qkv[:, pl.ds(ah, kvd)].reshape(n_kv, hd)
        v_new = qkv[:, pl.ds(ah + kvd, kvd)].reshape(n_kv, hd)

        def rms_rows(m, w_row):
            inv = jax.lax.rsqrt(jnp.mean(m * m, axis=1, keepdims=True) + eps)
            return m * inv * w_row

        if config.use_qk_norm:
            q = rms_rows(q, qn_ref[0])
            k_new = rms_rows(k_new, kn_ref[0])

        cos = cos_ref[:]  # [1, hd/2]
        sin = sin_ref[:]

        def rope(m):
            m1 = m[:, : hd // 2]
            m2 = m[:, hd // 2 :]
            return jnp.concatenate([m1 * cos - m2 * sin, m1 * sin + m2 * cos], axis=1)

        q = rope(q)
        k_new = rope(k_new)

        # ---- flash attention over the cache prefix + self row ----
        qs = q * scale
        s_self = jax.lax.dot_general(
            qs, k_new, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [n_heads, n_kv]
        self_shape = (n_heads, n_kv)
        r_kv0 = jax.lax.broadcasted_iota(jnp.int32, self_shape, 0) // kv_mul
        c_kv0 = jax.lax.broadcasted_iota(jnp.int32, self_shape, 1)
        m0 = jnp.sum(jnp.where(r_kv0 == c_kv0, s_self, 0.0), axis=1, keepdims=True)
        denom0 = jnp.ones_like(m0)
        acc0 = (
            jnp.broadcast_to(v_new[:, None, :], (n_kv, kv_mul, hd))
            .reshape(n_heads, hd)
            .astype(jnp.float32)
        )

        shape_blk = (n_heads, n_kv * blk)
        row_kv = jax.lax.broadcasted_iota(jnp.int32, shape_blk, 0) // kv_mul
        col_kv = jax.lax.broadcasted_iota(jnp.int32, shape_blk, 1) // blk
        col_t = jax.lax.broadcasted_iota(jnp.int32, shape_blk, 1) % blk
        n_blocks = pl.cdiv(p, blk)

        def att_step(j, carry):
            m, denom, a = carry
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_blocks)
            def _():
                start_kv(j + 1, 1 - slot)

            pltpu.make_async_copy(
                kc_ref.at[layer, 0, :, pl.ds(j * blk, blk), :],
                kbuf.at[slot], ksem.at[slot],
            ).wait()
            pltpu.make_async_copy(
                vc_ref.at[layer, 0, :, pl.ds(j * blk, blk), :],
                vbuf.at[slot], vsem.at[slot],
            ).wait()

            k2 = kbuf[slot].reshape(n_kv * blk, hd).astype(jnp.float32)
            scores = jax.lax.dot_general(
                qs, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ok = (row_kv == col_kv) & (j * blk + col_t < p)
            scores = jnp.where(ok, scores, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
            corr = jnp.exp(m - m_new)
            probs = jnp.exp(scores - m_new)
            denom = denom * corr + jnp.sum(probs, axis=1, keepdims=True)
            v2 = vbuf[slot].reshape(n_kv * blk, hd).astype(jnp.float32)
            a = a * corr + jax.lax.dot_general(
                probs, v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, denom, a

        m, denom, a = jax.lax.fori_loop(0, n_blocks, att_step, (m0, denom0, acc0))
        att = a / denom  # [n_heads, hd]
        act[:, pl.ds(0, ah)] = att.reshape(1, ah)

        # ---- in-place K/V row write, part 2: merge + write-back ----
        # The cache outputs alias the inputs, so the step's rows land
        # straight in the cache — no XLA scatter outside the kernel.  (A
        # loop-varying dynamic_update_slice in the decode scan forced a
        # full cache copy per step: ~1 ms at 8B.)  Merged only after the
        # attention loop so every read of this layer's rows has completed;
        # drained at the end of the grid step, overlapped with the
        # wo/w13/w2 streams.
        kv_write = (
            pltpu.make_async_copy(
                kblk, kco_ref.at[layer, 0, :, pl.ds(pb, row_blk), :], kwsem
            ),
            pltpu.make_async_copy(
                vblk, vco_ref.at[layer, 0, :, pl.ds(pb, row_blk), :], vwsem
            ),
        )

        @pl.when(write_ok != 0)
        def _():
            for c in kv_in:
                c.wait()
            r = jax.lax.broadcasted_iota(
                jnp.int32, (n_kv, row_blk, hd), 1
            ) == (p - pb)
            kblk[...] = jnp.where(r, k_new[:, None, :].astype(kblk.dtype), kblk[...])
            vblk[...] = jnp.where(r, v_new[:, None, :].astype(vblk.dtype), vblk[...])
            for c in kv_write:
                c.start()

        # ---- wo stream (+residual into x_vec); prefetch w13 tile 0 ----
        stream_phase(
            "wo", act, x_vec, True,
            [lambda: start_tile("w13", layer, 0, 0)],
        )

        # ---- ffn norm + w13 stream; prefetch w2 tile 0 ----
        xf2 = x_vec[:]
        inv2 = jax.lax.rsqrt(jnp.mean(xf2 * xf2, axis=1, keepdims=True) + eps)
        act[:, pl.ds(0, dim)] = xf2 * inv2 * rf_ref[0]
        stream_phase(
            "w13", act, gu, False,
            [lambda: start_tile("w2", layer, 0, 0)],
        )

        # ---- SwiGLU ----
        gate = gu[:, pl.ds(0, hidden)]
        up = gu[:, pl.ds(hidden, hidden)]
        act[:, pl.ds(0, hidden)] = gate * jax.nn.sigmoid(gate) * up

        # ---- w2 stream (+residual); prefetch next layer's wqkv tile 0
        # (or, on the last layer, the classifier's first tile) ----
        def start_next_wqkv():
            @pl.when(layer + 1 < n_layers)
            def _():
                start_tile("wqkv", layer + 1, 0, 0)

            if include_head:
                @pl.when(layer + 1 == n_layers)
                def _():
                    start_tile("head", 0, 0, 0)

        stream_phase("w2", act, x_vec, True, [start_next_wqkv])

        @pl.when(write_ok != 0)
        def _():
            for c in kv_write:
                c.wait()

        @pl.when(layer == n_layers - 1)
        def _():
            xo_ref[:] = x_vec[:]

        if include_head:
            # ---- final norm + classifier stream (last grid step only):
            # lm_head tiles follow the last w2 tiles with no kernel
            # boundary, so the weight stream never drains before the
            # logits are done (models/qwen3.rs:72-76 fused end-to-end).
            @pl.when(layer == n_layers - 1)
            def _():
                xf3 = x_vec[:]
                inv3 = jax.lax.rsqrt(
                    jnp.mean(xf3 * xf3, axis=1, keepdims=True) + eps
                )
                act[:, pl.ds(0, dim)] = xf3 * inv3 * rfin_ref[:]
                stream_phase("head", act, logits_ref, False, [], lyr=0, dest_rows=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("config", "eps", "interpret"))
def decode_stack_megakernel(
    config,
    x,  # [1, dim] f32 — embedded token (residual stream input)
    rms_att,  # [L, dim] f32
    rms_ffn,  # [L, dim]
    q_norm,  # [L, hd]
    k_norm,  # [L, hd]
    cos,  # [1, hd//2] f32 — RoPE row for the current position
    sin,  # [1, hd//2]
    wqkv,  # QuantizedTensor [L, dim, ah+2kvd]
    wo,
    w13,
    w2,
    k_cache,  # [L, 1, n_kv, T, hd]
    v_cache,
    pos,  # [1] int32
    rms_final=None,  # [dim] f32 — with lm_head: fuse the classifier phase
    lm_head=None,  # QuantizedTensor [dim, v_pad]
    write_ok=None,  # [1] bool/int — gate the cache row write (default on)
    *,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """One full decode step over all layers → (x_out [1, dim] f32,
    k_cache' [L, 1, n_kv, T, hd], v_cache' [L, 1, n_kv, T, hd],
    logits [1, v_pad] f32 | None).

    The returned caches are the inputs updated IN PLACE at ``pos``
    (``input_output_aliases``): the step's K/V rows are DMA'd into the
    cache inside the kernel, so the decode scan carries the cache with no
    XLA scatter (a loop-varying scatter copies the whole cache per step).

    With ``lm_head``/``rms_final`` the final norm + classifier run as the
    kernel's last phase: the lm_head tiles stream immediately behind the
    last layer's w2 tiles (no pallas_call boundary before the logits)."""
    L = wqkv.q.shape[0]
    dim = config.dim
    ah, kvd, hidden = config.all_heads_dim, config.kv_dim, config.hidden_dim
    hd, n_kv = config.head_dim, config.n_kv_heads
    g = config.group_size
    t = k_cache.shape[3]
    blk = _pick_blk(t)
    include_head = lm_head is not None
    row_blk = 8 if k_cache.dtype == jnp.float32 else 16

    tiles = {
        "wqkv": _mk_tiles(dim, ah + 2 * kvd, g),
        "wo": _mk_tiles(ah, dim, g),
        "w13": _mk_tiles(dim, 2 * hidden, g),
        "w2": _mk_tiles(hidden, dim, g),
    }
    v_pad = None
    if include_head:
        v_pad = lm_head.q.shape[-1]
        tiles["head"] = _mk_tiles(dim, v_pad, g)
    td_max = max(v[1] for v in tiles.values())

    kernel = _mk_kernel(config, tiles, blk, eps, k_cache.dtype, L, v_pad=v_pad)

    sdt = wqkv.scales.dtype  # bf16 in the fast engine; f32 in raw loads
    names = ["wqkv", "wo", "w13", "w2"] + (["head"] if include_head else [])
    wbufs = [pltpu.VMEM((2, *tiles[n]), jnp.int8) for n in names]
    sbufs = [pltpu.VMEM((2, tiles[n][0] // g, tiles[n][1]), sdt) for n in names]
    scratch = (
        [
            pltpu.VMEM((1, dim), jnp.float32),  # x_vec
            pltpu.VMEM((1, max(dim, ah, hidden)), jnp.float32),  # act
            pltpu.VMEM((1, ah + 2 * kvd), jnp.float32),  # qkv
            pltpu.VMEM((1, 2 * hidden), jnp.float32),  # gu
            pltpu.VMEM((1, td_max), jnp.float32),  # acc
        ]
        + wbufs
        + sbufs
        + [pltpu.SemaphoreType.DMA((2,)) for _ in range(2 * len(names))]
        + [
            pltpu.VMEM((2, n_kv, blk, hd), k_cache.dtype),  # kbuf
            pltpu.VMEM((2, n_kv, blk, hd), v_cache.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + [
            # In-place row write staging: sublane tile × packing rows
            # (f32: 8, bf16: 16) so the HBM slice is tile-aligned.
            pltpu.VMEM((n_kv, row_blk, hd), k_cache.dtype),  # kblk
            pltpu.VMEM((n_kv, row_blk, hd), v_cache.dtype),  # vblk
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    )

    vmem_specs = [
        pl.BlockSpec((1, dim), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, dim), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, dim), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hd // 2), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hd // 2), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
    ]
    if include_head:
        vmem_specs.append(
            pl.BlockSpec((1, dim), lambda l, s: (0, 0), memory_space=pltpu.VMEM)
        )
    n_any = 2 * len(names) + 2  # weight (codes, scales) pairs + k/v cache

    out_specs = [
        pl.BlockSpec((1, dim), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # k_cache (aliases the input)
        pl.BlockSpec(memory_space=pl.ANY),  # v_cache
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, dim), jnp.float32),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    if include_head:
        tn_h, td_h = tiles["head"]
        i_head = v_pad // td_h
        out_specs.append(
            pl.BlockSpec(
                (i_head, td_h), lambda l, s: (0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((i_head, td_h), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=vmem_specs + [pl.BlockSpec(memory_space=pl.ANY)] * n_any,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    ok = (
        jnp.ones((1,), jnp.int32)
        if write_ok is None
        else jnp.asarray(write_ok).astype(jnp.int32).reshape(1)
    )
    args = [
        jnp.concatenate([jnp.asarray(pos, jnp.int32).reshape(1), ok]),
        x.astype(jnp.float32),
        rms_att[:, None, :],
        rms_ffn[:, None, :],
        q_norm[:, None, :],
        k_norm[:, None, :],
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
    ]
    if include_head:
        args.append(rms_final[None, :].astype(jnp.float32))
    args += [wqkv.q, wqkv.scales, wo.q, wo.scales, w13.q, w13.scales, w2.q, w2.scales]
    if include_head:
        args += [lm_head.q[None], lm_head.scales[None]]
    args += [k_cache, v_cache]
    # Alias indices are over the FLAT args (scalar prefetch included).
    i_kc = len(args) - 2

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={i_kc: 1, i_kc + 1: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*args)
    if include_head:
        x_out, k_new, v_new, logits = out
        # [I, td] row-major == the vocab order; flatten for the caller.
        return x_out, k_new, v_new, logits.reshape(1, v_pad)
    x_out, k_new, v_new = out
    return x_out, k_new, v_new, None
