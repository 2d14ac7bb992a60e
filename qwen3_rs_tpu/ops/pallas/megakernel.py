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

Batching (B ≤ 16): the residual stream, matmul phases and cache writes are
[B, ...]-vectorized; attention runs per batch row with per-row positions
(a Python loop — B is static), the next row's first cache block DMA'd one
row ahead into row-parity buffers so the cache stream stays busy across
rows.  The weight stream — the decode bottleneck — is batch-invariant:
a b=8 step costs nearly the same HBM time as b=1, which is the whole
point of engaging the megakernel for batched serving decode.

INT8 KV cache: codes stream with per-row scales folded into the scores
(K) and probabilities (V) exactly like flash v2; the step's new K/V rows
are quantized in-kernel (symmetric per head row) and both codes and scales
are written back in place.

Numerics match the fused qmatmul path: bf16 dequant (codes exact in bf16),
bf16 dot inputs, f32 accumulation, f32 residual stream (the unfused path
carries bf16 residuals; parity tests use bf16-level tolerances).

Replaces the reference inner loops tensor.rs:23-62 + layers.rs:287-420 for
the dense-cache decode step (S=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _pick_blk

# ~Codes bytes per weight tile.  0 = auto, resolved per model dim by
# _resolve_tile_bytes: 2 MB for the tuned 8B/1.7B/0.6B configs (the r4
# corrected same-process sweeps measured 4 MB worse at 8B and 2 MB best at
# 4B under the OLD ≤1024-row plans), 6 MB at dim 2560 where full-depth
# plans want the bigger budget (r5 interleaved sweep: 2→6 MB lifts 4B
# decode 0.822→0.878 of roofline; 8 MB regresses).  2 MB is also the
# compile-cache-warm configuration, which matters here: the deployment's
# remote-compile service intermittently takes 25+ min for a fresh program.
import os as _os

def _tile_bytes() -> int:
    """Per-tile code-byte budget (default env read — see
    :func:`megakernel_tuning` for why same-process A/Bs must thread these
    values as statics instead of relying on env reads here).  0 = auto."""
    return int(_os.environ.get("QWEN3_TPU_MEGA_TILE_BYTES", "0"))


def _resolve_tile_bytes(tb: int, dim: int) -> int:
    """Resolve the auto (0) tile budget against the model dim."""
    if tb:
        return tb
    return 6 * 1024 * 1024 if dim == 2560 else 2 * 1024 * 1024


def megakernel_tuning() -> tuple[int, bool, int, int, int, int, int, int, int]:
    """(tile_bytes, attn_prefetch, q4_elems, head_tile_bytes,
    head_lookahead, unroll, head_a8, fulldepth, head_pipe) from the
    environment.

    Read by the DISPATCH (models/qwen3.py) at outer-trace time and passed
    to :func:`decode_stack_megakernel` as the static ``tuning`` argument.
    The kernel builder is itself jitted, and an inner jit's jaxpr is
    cached by (avals, statics) — an env var read inside it is frozen at
    the FIRST trace of a given signature, so env toggling alone cannot
    A/B kernel variants within one process (review finding: the original
    tile-size and attention-prefetch sweeps compared the first-traced
    kernel against itself).  Making the knobs part of the static
    signature gives each setting its own cache entry.

    ``head_tile_bytes``: classifier-phase tile budget.  0 = auto
    (resolved per model in decode_stack_megakernel): the optimum
    INTERACTS with the layer unroll — at 0.6B/unroll=1 6 MB tiles beat
    2 MB by +1.9%, but under unroll=4 (the small-model default) 2 MB
    beats 6 MB by +1.4%; 8B slightly prefers 6 MB (+0.2%, noise-level).
    Auto: 2 MB for dim ≤ 2048, else 6 MB.
    ``head_lookahead``: how many head tiles stay in flight ahead of the
    compute (slots = lookahead + 1).
    ``unroll``: consecutive layers per grid step — fewer grid entries
    amortize the per-step fixed cost.  0 = auto (resolved against the
    model in decode_stack_megakernel): 4 for small-dim models — measured
    +11% at 0.6B (0.867 ms vs 0.949, interleaved A/B; 7 and 14 regress) —
    and 1 for large ones (8B measured best at 1, its 290 µs layers
    already amortize the entry cost).  Silently falls back to 1 if it
    doesn't divide n_layers.
    ``head_a8``: classifier phase as per-group int8×int8 MXU dots with an
    f32 row fixup instead of dequant+bf16 dot (1 = per-128-lane activation
    scales, 2 = per-token).  MEASURED NO — stays 0: the isolated compute
    path is ~4× faster (scripts/head_a8_probe.py: 1.5-1.9 µs/tile
    int8-seg vs 6.6-6.8 dequant+dot, interleaved, two runs), but the
    END-TO-END interleaved A/B loses at both models (8B 10.721 vs
    10.575 ms; 0.6B −0.4% (a8=1) / −1.5% (a8=2)) — in situ the phase is
    not bound by the dequant VPU pass the way the resident-tile probe
    suggested (the int8 dot chain pipelines worse against the live DMA
    stream).  Kept opt-in for future hardware; numerics shift by
    activation-quant noise on LOGITS ONLY (parity-tested rel < 0.05).
    ``fulldepth``: admit tn == n tile plans past the 1024-row cap
    (0 = off, 1 = on, 2 = auto: on at dim 2560 — the 4B body fix).
    ``head_pipe``: software-pipeline the classifier phase — dequantize
    tile t into double-buffered bf16 scratch while the MXU dots tile t-1
    (the fifth lever at the diagnosed dequant+dot serialization;
    0 = off, 1 = on, 2 = auto).  Costs 2 extra bf16 head tiles of VMEM."""
    tb = _tile_bytes()
    return (
        tb,
        _attn_prefetch_enabled(),
        int(_os.environ.get("QWEN3_TPU_MEGA_Q4_ELEMS", tb)),
        int(_os.environ.get("QWEN3_TPU_MEGA_HEAD_TILE_BYTES", "0")),
        int(_os.environ.get("QWEN3_TPU_MEGA_HEAD_LA", "2")),
        int(_os.environ.get("QWEN3_TPU_MEGA_UNROLL", "0")),
        int(_os.environ.get("QWEN3_TPU_MEGA_HEAD_A8", "0")),
        int(_os.environ.get("QWEN3_TPU_MEGA_FULLDEPTH", "2")),
        int(_os.environ.get("QWEN3_TPU_MEGA_HEAD_PIPE", "2")),
    )


_VMEM_LIMIT = int(_os.environ.get("QWEN3_TPU_MEGA_VMEM_LIMIT", 100 * 1024 * 1024))

# Scale-row staging width for the INT8 cache: the scale arrays' last axis
# (T) is the lane axis, so the read-modify-write block must span 128 lanes.
_SCALE_BLK = 128


def max_megakernel_batch() -> int:
    return int(_os.environ.get("QWEN3_TPU_MEGA_MAX_B", "8"))


def _mk_tiles(
    n: int,
    d: int,
    g: int,
    q4: bool = False,
    tile_bytes: int | None = None,
    max_q4_elems: int | None = None,
    td_cap: int = 4096,
    full_depth: bool = False,
) -> tuple[int, int] | None:
    """(tn, td) dividing (n, d): tn%g==0 with 8-aligned group rows (or
    tn==n), td%256==0 (or td==d, 128-aligned), code bytes ≤ _TILE_BYTES.
    ``q4``: codes are nibble-packed [n/2, d] uint8 — a tile streams
    tn·td/2 bytes, so tiles can span twice the logical rows.  ``td_cap``:
    widest allowed output block — the classifier phase raises it (its
    152064-column matrix tiles poorly under 4096: 1.5 MB tiles at 2 MB
    budget) so bigger head tiles amortize the per-tile fixed cost.
    ``full_depth``: also admit tn == n beyond the 1024-row cap (K = 1
    plans — no accumulation loop, static scale-row offsets).  The cap
    exists because 8B tuned best with 1024-row tiles, but at dim 2560 it
    forces 512-row tiles and — fatally for w13, whose 19456 columns carry
    a factor 19 — 512 KB tiles (95/layer); full-depth plans restore
    ~4B-sized tiles there (see the dim-2560 deficit, docs/kernels.md)."""
    tn_cands = [
        c
        for c in range(g, n + 1, g)
        if n % c == 0 and ((c // g) % 8 == 0 or c == n) and c <= 1024
    ] or ([n] if n % g == 0 else [])
    if full_depth and n % g == 0 and (n // g) % 8 == 0 and n not in tn_cands:
        tn_cands = tn_cands + [n]
    if q4:
        # Packed sublane slices: tn/2 byte rows must stay 32-aligned
        # (uint8 tiling) for the HBM DMA offset k·tn/2.
        tn_cands = [c for c in tn_cands if c % 2 == 0 and (c // 2) % 32 == 0]
    td_cands = [c for c in range(256, d + 1, 256) if d % c == 0 and c <= td_cap]
    if not td_cands and d % 128 == 0:
        td_cands = [d]
    # INT4 tiles are budgeted by ELEMENT count, not code bytes: the
    # in-kernel nibble unpack materializes int32/bf16 temps per element,
    # so a "2 MB" packed tile costs 4M elements of VMEM churn — measured
    # 70 tok/s vs 111 for the per-matrix path at 8B before this cap.
    if not tile_bytes:
        # No model-dim context here — fall back to env or the 2 MB base.
        tile_bytes = _resolve_tile_bytes(_tile_bytes(), 0)
    if not max_q4_elems:
        max_q4_elems = int(_os.environ.get("QWEN3_TPU_MEGA_Q4_ELEMS", tile_bytes))
    best = None
    for tn in tn_cands:
        for td in td_cands:
            code_bytes = tn * td // 2 if q4 else tn * td
            if code_bytes > tile_bytes or (q4 and tn * td > max_q4_elems):
                continue
            key = (code_bytes, -((n // tn) * (d // td)))
            if best is None or key > best[0]:
                best = (key, tn, td)
    return None if best is None else (best[1], best[2])


def megakernel_supported(
    config, t: int, dtype, batch: int = 1, q4: bool = False
) -> bool:
    """Static dims check for the whole-stack decode kernel."""
    import os

    if os.environ.get("QWEN3_TPU_DISABLE_MEGAKERNEL", "0") == "1":
        return False
    if dtype not in (jnp.bfloat16, jnp.float32, jnp.int8):
        return False
    if batch > max_megakernel_batch():
        return False
    if config.head_dim != 128 or config.n_heads % config.n_kv_heads:
        return False
    if _pick_blk(t) is None:
        return False
    if dtype == jnp.int8 and (t % _SCALE_BLK or _pick_blk(t) % _SCALE_BLK):
        return False
    g = config.group_size
    if q4 and g % 2:
        return False
    if q4 and os.environ.get("QWEN3_TPU_MEGA_Q4", "0") != "1":
        # The megakernel's Q4 path measures BELOW the per-matrix Q4
        # kernels at 8B (round 3: 82 vs 129 tok/s with the shift unpack,
        # scripts/mega_ab.py q4tiles): the in-body nibble unpack doesn't
        # software-pipeline across the fori tile loop the way the
        # per-matrix grids do, so the stream goes VPU-bound.  Round 4
        # established the unpack cost floor is structural on v5e (no bf16
        # ALU — docs/quantization.md) and two pass-count reductions
        # ("dotbias", biased packing) measured neutral, so the per-matrix
        # path stays the Q4 default; opt-in kept for A/Bs.
        return False
    dims = [
        (config.dim, config.all_heads_dim + 2 * config.kv_dim),
        (config.all_heads_dim, config.dim),
        (config.dim, 2 * config.hidden_dim),
        (config.hidden_dim, config.dim),
    ]
    # Mirror the builder's auto resolution (tile budget + full-depth
    # candidacy) so the gate validates the plans the kernel will build.
    tb = _resolve_tile_bytes(_tile_bytes(), config.dim)
    fd_env = int(os.environ.get("QWEN3_TPU_MEGA_FULLDEPTH", "2"))
    fd = config.dim == 2560 if fd_env == 2 else bool(fd_env)
    for n, d in dims:
        tiles = _mk_tiles(n, d, g, q4=q4, tile_bytes=tb, full_depth=fd)
        # Mosaic requires the scale block's sublane extent (groups per
        # tile) 8-aligned for the HBM slice; tiny test dims only run in
        # interpret mode.
        if tiles is None or (tiles[0] // g) % 8 != 0:
            return False
    return True


_HEAD_TD_CAP = 8192


def head_phase_supported(config, v_pad: int, head_tile_bytes: int | None = None) -> bool:
    """Whether the classifier matmul can run as the megakernel's final
    phase (streamed right behind the last w2 tiles).  Pass the tuning's
    head budget so the gate validates the tiles the kernel will build."""
    if not head_tile_bytes:  # 0/None = auto, same rule as the builder
        head_tile_bytes = 2 * 1024 * 1024 if config.dim <= 2048 else 6 * 1024 * 1024
    # Mirror the builder's full-depth candidacy so the gate validates the
    # head plan the kernel will actually build (same rule as the body gate).
    fd_env = int(_os.environ.get("QWEN3_TPU_MEGA_FULLDEPTH", "2"))
    fd = config.dim == 2560 if fd_env == 2 else bool(fd_env)
    tiles = _mk_tiles(
        config.dim, v_pad, config.group_size,
        tile_bytes=head_tile_bytes, td_cap=_HEAD_TD_CAP, full_depth=fd,
    )
    return tiles is not None and (tiles[0] // config.group_size) % 8 == 0


def _dequant(codes, scales, g: int):
    """int8 [tn, td] × group scales [tn//g, td] → bf16 [tn, td]."""
    tg = codes.shape[0] // g
    sc = jnp.broadcast_to(
        scales.astype(jnp.bfloat16)[:, None, :], (tg, g, codes.shape[1])
    ).reshape(codes.shape)
    return codes.astype(jnp.bfloat16) * sc


def _mk_plans(config, tiles, v_pad=None):
    """Per-matrix static tile plans: name → (tn, td, K, I)."""
    mats = [
        ("wqkv", (config.dim, config.all_heads_dim + 2 * config.kv_dim)),
        ("wo", (config.all_heads_dim, config.dim)),
        ("w13", (config.dim, 2 * config.hidden_dim)),
        ("w2", (config.hidden_dim, config.dim)),
    ]
    if v_pad is not None:
        mats.append(("head", (config.dim, v_pad)))
    plans = {}
    for name, (n, d) in mats:
        tn, td = tiles[name]
        plans[name] = (tn, td, n // tn, d // td)
    return plans


def _attn_prefetch_enabled() -> bool:
    """A/B gate for the attention-boundary weight prefetch (wo 4-slot
    pre-start + chained w13 pre-start).  Trace-time env read."""
    return _os.environ.get("QWEN3_TPU_MEGA_ATTN_PREFETCH", "1") != "0"


def _buf_slots(
    plans, attn_prefetch: bool = True, head_lookahead: int = 1
) -> dict[str, int]:
    """Weight-buffer slot count per matrix.  Everything double-buffers
    except wo, which gets 4 slots: its first tiles are pre-started before
    the attention phase — the only stretch of the layer where no matmul
    phase is streaming — so the weight stream stays busy through
    attention's compute bubble (measured ~0.93 of roofline for the kernel
    body at 8B with one wo tile in flight; one 2 MB tile covers ~2.5 µs
    of a ~10 µs/layer bubble).  The head keeps ``head_lookahead`` tiles
    in flight ahead of the compute (slots = lookahead + 1)."""
    out = {}
    for name, (tn, td, K, I) in plans.items():
        total = K * I
        ns = 2 if total >= 2 else 1
        if name == "wo" and total >= 4 and attn_prefetch:
            ns = 4
        if name == "head":
            ns = min(head_lookahead + 1, total) if total >= 2 else 1
        out[name] = ns
    return out


def _mk_kernel(
    config, tiles, blk, eps, cache_dtype, n_layers, batch, v_pad=None, q4=False,
    attn_prefetch=True, head_la=1, greedy=False, unroll=1, head_a8=False,
    head_pipe=False,
):
    dim = config.dim
    ah = config.all_heads_dim
    kvd = config.kv_dim
    hidden = config.hidden_dim
    n_heads, n_kv, hd = config.n_heads, config.n_kv_heads, config.head_dim
    kv_mul = n_heads // n_kv
    g = config.group_size
    scale = 1.0 / (hd**0.5)
    vocab_size = config.vocab_size
    include_head = v_pad is not None
    quant = cache_dtype == jnp.int8
    B = batch

    plans = _mk_plans(config, tiles, v_pad)
    mat_names = list(plans)
    n_slots = _buf_slots(plans, attn_prefetch, head_la)
    if include_head:
        # Ramp contract (stream_phase): pre-start exactly ``lookahead``
        # tiles so iteration t can issue tile t+lookahead.
        head_pre = min(n_slots["head"] - 1, plans["head"][2] * plans["head"][3])
        head_pre = max(head_pre, 1)
    # Tiles pre-started before the attention phase (see start_attn_dmas):
    # as much of wo as fits its slots, and — when that is ALL of wo (small
    # models: 0.6B's wo is 2 tiles ≈ 2 MB, covering ~2.5 µs of a ~6-10 µs
    # bubble) — the first w13 tiles too, so the stream keeps going.
    wo_total = plans["wo"][2] * plans["wo"][3]
    if attn_prefetch:
        wo_pre = min(n_slots["wo"], wo_total)
        w13_pre = (
            min(n_slots["w13"], plans["w13"][2] * plans["w13"][3])
            if wo_pre == wo_total
            else 0
        )
    else:
        wo_pre, w13_pre = 1, 0

    def kernel(
        # scalar prefetch
        pos_ref,  # [2B] int32: positions [B], then write gates [B]
        # inputs
        x_ref,  # [B, dim] f32
        ra_ref,  # [1, 1, dim] f32  (rms_att, layer block)
        rf_ref,  # [1, 1, dim] f32  (rms_ffn)
        qn_ref,  # [1, 1, hd] f32
        kn_ref,  # [1, 1, hd] f32
        cos_ref,  # [B, hd//2] f32
        sin_ref,  # [B, hd//2] f32
        *rest,
    ):
        it = iter(rest)
        rfin_ref = next(it) if include_head else None  # [1, dim] rms_final
        wqkv_q, wqkv_s = next(it), next(it)  # HBM (ANY)
        wo_q, wo_s = next(it), next(it)
        w13_q, w13_s = next(it), next(it)
        w2_q, w2_s = next(it), next(it)
        head_q, head_s = (next(it), next(it)) if include_head else (None, None)
        kc_ref, vc_ref = next(it), next(it)  # [L, B, n_kv, T, hd] cache
        ksc_ref = next(it) if quant else None  # [L, B, n_kv, T] f32
        vsc_ref = next(it) if quant else None
        # outputs
        xo_ref = next(it)  # [B, dim] f32
        kco_ref = next(it)  # ALIASES kc_ref (in-place row write at pos)
        vco_ref = next(it)
        ksco_ref = next(it) if quant else None  # ALIASES ksc_ref
        vsco_ref = next(it) if quant else None
        # [I, B, td] f32 logits — or, in greedy mode, [B, 128] i32 token.
        head_out_ref = next(it) if include_head else None
        # scratch (persists across grid steps) — flat, regrouped below
        scr = list(it)
        nm = len(mat_names)
        (x_vec, act, qkv, gu, acc) = scr[:5]
        scr = scr[5:]
        wbufs, sbufs = scr[:nm], scr[nm : 2 * nm]
        wsems, ssems = scr[2 * nm : 3 * nm], scr[3 * nm : 4 * nm]
        scr = scr[4 * nm :]
        kbuf, vbuf, ksem, vsem = scr[:4]
        scr = scr[4:]
        if quant:
            ksbuf, vsbuf, kssem, vssem = scr[:4]
            scr = scr[4:]
        kblk, vblk, kisem, visem, kwsem, vwsem = scr[:6]
        scr = scr[6:]
        if quant:
            ksblk, vsblk, ksisem, vsisem, kswsem, vswsem = scr[:6]
            scr = scr[6:]
        if greedy:
            best_val, best_blk = scr[:2]  # [B, td_head] f32 / i32
            scr = scr[2:]
        if head_a8:
            # Quantized head activation: int8 codes + per-128-lane scales,
            # written once per step before the classifier stream.
            head_xq, head_xs = scr[:2]  # [B, dim] i8 / [B, dim//128] f32
            scr = scr[2:]
        if head_pipe:
            # Software-pipeline scratch: dequantized bf16 head tiles,
            # double-buffered — iteration t dots tile t-1 from here while
            # the VPU dequantizes tile t (see stream_phase pipe mode).
            head_wpipe = scr[0]  # [2, tn_head, td_head] bf16

        base_layer = pl.program_id(0)

        # One grid step covers ``unroll`` consecutive layers: fewer
        # grid entries amortize the per-step fixed cost (measured
        # ~µs-scale per entry — significant at 0.6B's 26 µs layers).
        # first/last_possible statically prune the layer-0 init and
        # the fused-head phase to the only unrolled slot where their
        # traced conditions can hold, so the code isn't emitted U times.
        def run_layer(layer, u, first_possible, last_possible):
            t_cache = kc_ref.shape[3]

            def pos_b(b):
                # Always clamped (scalar min in SMEM — free): on the
                # write-gated (serving) path a batched decode chunk's
                # scan-carried position keeps advancing for slots that
                # already hit the window end (their rows are masked and
                # discarded), so the raw value can exceed the cache's T axis
                # — unclamped it would size the attention loop to DMA one
                # block past the allocation.  Ungated callers must never
                # pass positions ≥ T (the dispatch refuses concrete
                # violations — models/qwen3.py); the clamp is defense in
                # depth for traced positions the host cannot inspect.
                return jnp.minimum(pos_ref[b], t_cache)

            def pos_w(b):
                # Write-path variant: the row-write staging block must start
                # inside the array even for gated-off (masked) slots.
                return jnp.minimum(pos_ref[b], t_cache - 1)

            def write_b(b):
                return pos_ref[B + b]

            # ---- in-place K/V row write, part 1: block read-in (per row) ----
            # Mosaic HBM slices must be sublane-tile aligned, so a single row
            # at a dynamic position can't be DMA'd directly; instead the
            # tile-aligned row block containing ``p`` is read in, the new row
            # merged in VMEM after attention, and the block written back.
            row_blk = kblk.shape[2]

            def kv_in_copies(b):
                pb = (pos_w(b) // row_blk) * row_blk
                copies = [
                    pltpu.make_async_copy(
                        kc_ref.at[layer, b, :, pl.ds(pb, row_blk), :],
                        kblk.at[b], kisem.at[b],
                    ),
                    pltpu.make_async_copy(
                        vc_ref.at[layer, b, :, pl.ds(pb, row_blk), :],
                        vblk.at[b], visem.at[b],
                    ),
                ]
                if quant:
                    pbs = (pos_w(b) // _SCALE_BLK) * _SCALE_BLK
                    copies += [
                        pltpu.make_async_copy(
                            ksc_ref.at[layer, b, :, pl.ds(pbs, _SCALE_BLK)],
                            ksblk.at[b], ksisem.at[b],
                        ),
                        pltpu.make_async_copy(
                            vsc_ref.at[layer, b, :, pl.ds(pbs, _SCALE_BLK)],
                            vsblk.at[b], vsisem.at[b],
                        ),
                    ]
                return copies

            for b in range(B):
                @pl.when(write_b(b) != 0)
                def _(b=b):
                    for c in kv_in_copies(b):
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
                # INT4 layer matrices: codes are nibble-packed [n/2, d] uint8,
                # so the tile's byte rows are [k·tn/2, (k+1)·tn/2) — packing is
                # group split-half, and tn % g == 0 keeps tiles group-whole.
                tnb = tn // 2 if (q4 and name != "head") else tn
                cw = pltpu.make_async_copy(
                    wq_ref.at[lyr, pl.ds(k * tnb, tnb), pl.ds(i * td, td)],
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
                dest_rows=False, pre=1, lookahead=1, dest_argmax=False,
                pipe=False,
            ):
                """Run one matmul phase: dest[:, i·td] ← Σ_k x[k·tn] · W tile.

                ``next_starts``: list of thunks issuing the NEXT phase's first
                DMAs, called once at the loop's final tile so the following
                stream is in flight before this one drains.  ``lyr`` overrides
                the weight stack's layer index (the classifier is [1, N, D]).
                ``pre``: how many of this phase's tiles the caller already
                started (into slots 0..pre-1); the loop begins issuing at tile
                ``pre``.  ``lookahead``: how many tiles to keep in flight
                ahead of the compute (iteration t issues tile t+lookahead;
                requires lookahead ≤ pre and lookahead < slot count, so the
                caller must pre-start ``lookahead`` tiles).  ``dest_argmax``:
                greedy head epilogue — instead of storing logits blocks, fold
                each block's (masked) max + first-max column into the running
                (best_val, best_idx) scratch; the caller initializes the
                scratch and stores the winning index after the loop.
                ``pipe``: software-pipeline the dequant against the dot —
                iteration t dequantizes tile t into the double-buffered bf16
                scratch (head_wpipe) and dots tile t-1 from the OTHER slot,
                so the VPU dequant pass and the MXU dot (whose per-tile
                serialization caps the head phase at 0.68) can overlap; the
                last tile's dot drains after the loop.
                """
                tn, td, K, I = plans[name]
                tg = tn // g
                wbuf, sbuf, wsem, ssem = bufs[name]
                lyr = layer if lyr is None else lyr
                n_sl = n_slots[name]

                def _finish(i, k, part):
                    """Accumulate ``part`` and, at the output block's last
                    depth tile, run the store/residual/argmax epilogue."""
                    if K > 1:
                        @pl.when(k == 0)
                        def _():
                            acc[:, pl.ds(0, td)] = jnp.zeros((B, td), jnp.float32)

                        acc[:, pl.ds(0, td)] += part

                    @pl.when(k == K - 1)
                    def _():
                        # K == 1 (full-depth plans): every tile is its own
                        # output block — skip the acc zero/add/read trip.
                        block = part if K == 1 else acc[:, pl.ds(0, td)]
                        if dest_argmax:
                            # Greedy epilogue, lane-parallel: per block only
                            # ELEMENTWISE updates of the running per-lane best
                            # (value, block) — the cross-lane reduction happens
                            # ONCE at phase end.  (A per-block lane argmax
                            # measured SLOWER than the XLA argmax it replaced:
                            # 27 blocks × two 5632-lane reductions at 0.6B.)
                            # Padded vocab columns are masked to -inf (the XLA
                            # path slices [:vocab_size] first); strict > keeps
                            # the earliest block per lane — with the final
                            # min-global-index tie-break this reproduces
                            # jnp.argmax first-max semantics exactly.
                            lane = jax.lax.broadcasted_iota(jnp.int32, (B, td), 1)
                            bm = jnp.where(
                                lane + i * td < vocab_size, block, -jnp.inf
                            )
                            better = bm > best_val[:]
                            best_val[:] = jnp.where(better, bm, best_val[:])
                            best_blk[:] = jnp.where(better, i, best_blk[:])
                        elif dest_rows:
                            # dest is [I, B, td]: a dynamic SUBLANE store.  (A
                            # dynamic-lane store into a very wide vector —
                            # the padded vocab — measured ~15 µs each; the
                            # row layout makes it free.  Caller reshapes.)
                            dest[pl.ds(i, 1), :, :] = block[None]
                        elif dest_residual:
                            dest[:, pl.ds(i * td, td)] += block
                        else:
                            dest[:, pl.ds(i * td, td)] = block

                def emit(j, wf):
                    """Dot + accumulate + epilogue for tile ``j`` given its
                    dequantized weights ``wf`` (traced j; static shapes)."""
                    i = j // K
                    k = jax.lax.rem(j, K)
                    xt = src_ref[:, pl.ds(k * tn, tn)].astype(jnp.bfloat16)
                    part = jax.lax.dot_general(
                        xt, wf, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [B, td]
                    _finish(i, k, part)

                def body(t, _):
                    slot = jax.lax.rem(t, n_sl)
                    i = t // K
                    k = jax.lax.rem(t, K)

                    nxt = t + lookahead
                    started_cond = (
                        nxt < K * I
                        if pre <= lookahead
                        else jnp.logical_and(nxt < K * I, nxt >= pre)
                    )

                    @pl.when(started_cond)
                    def _():
                        start_tile(name, lyr, nxt, jax.lax.rem(nxt, n_sl))

                    @pl.when(t + 1 == K * I)
                    def _():
                        for s in next_starts:
                            s()

                    if pipe:
                        # Dot tile t-1 from the already-dequantized pipe slot
                        # BEFORE waiting on tile t's DMA: the MXU chews the
                        # previous tile while this tile's codes land, then
                        # the VPU dequantizes tile t — the dequant and the
                        # dot no longer serialize per tile.
                        @pl.when(t > 0)
                        def _():
                            emit(t - 1, head_wpipe[jax.lax.rem(t - 1, 2)])

                        cw, cs = tile_copies(name, lyr, t, slot)
                        cw.wait()
                        cs.wait()
                        head_wpipe[jax.lax.rem(t, 2)] = _dequant(
                            wbuf[slot], sbuf[slot], g
                        )
                        return 0

                    cw, cs = tile_copies(name, lyr, t, slot)
                    cw.wait()
                    cs.wait()

                    if head_a8 and name == "head":
                        # Per-group int8 dots: the weight tile goes straight
                        # into the MXU — no [tn, td] VPU dequant (the pass
                        # that serialized this phase at 0.68 of its DMA
                        # share); fixup is 3 f32 ops on the [B, td] partial
                        # per 64-deep group (scripts/head_a8_probe.py).
                        # K == 1 (builder-enforced): every offset is STATIC
                        # — Mosaic refuses dynamic sub-128-lane loads — and
                        # the scale row loads once per tile as a value.
                        xsv = head_xs[:]  # [B, dim//128]
                        part = jnp.zeros((B, td), jnp.float32)
                        for gi in range(tg):
                            off = gi * g
                            dq = jax.lax.dot_general(
                                head_xq[:, off : off + g],
                                wbuf[slot][gi * g : (gi + 1) * g, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32,
                            )
                            part += (
                                dq.astype(jnp.float32)
                                * sbuf[slot][gi][None, :]
                                * xsv[:, off // 128 : off // 128 + 1]
                            )
                    else:
                        xt = src_ref[:, pl.ds(k * tn, tn)].astype(jnp.bfloat16)
                        if q4 and name != "head":
                            from .qmatmul import _dequant_tile_q4

                            wf = _dequant_tile_q4(
                                wbuf[slot], sbuf[slot], group_size=g, tile_groups=tg
                            )
                        else:
                            wf = _dequant(wbuf[slot], sbuf[slot], g)
                        part = jax.lax.dot_general(
                            xt, wf, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [B, td]

                    _finish(i, k, part)
                    return 0

                jax.lax.fori_loop(0, K * I, body, 0, unroll=False)
                if pipe:
                    # Drain: the last tile's dot never ran inside the loop.
                    last = K * I - 1
                    emit(last, head_wpipe[last % 2])

            # ---- layer entry: residual stream init, att-norm ----
            if first_possible:  # layer == 0 only reachable at u == 0
                @pl.when(layer == 0)
                def _():
                    x_vec[:] = x_ref[:]
                    start_tile("wqkv", 0, 0, 0)

            xf = x_vec[:]
            inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
            act[:, pl.ds(0, dim)] = xf * inv * ra_ref[u]

            # ---- attention cache-block DMAs.  Buffers are [row-parity, slot]:
            # the next row's block 0 is issued one row ahead (different parity,
            # no clash with the current row's double buffering).
            def start_kv(b, j, slot):
                rp = b % 2
                pltpu.make_async_copy(
                    kc_ref.at[layer, b, :, pl.ds(j * blk, blk), :],
                    kbuf.at[rp, slot], ksem.at[rp, slot],
                ).start()
                pltpu.make_async_copy(
                    vc_ref.at[layer, b, :, pl.ds(j * blk, blk), :],
                    vbuf.at[rp, slot], vsem.at[rp, slot],
                ).start()
                if quant:
                    pltpu.make_async_copy(
                        ksc_ref.at[layer, b, :, pl.ds(j * blk, blk)],
                        ksbuf.at[rp, slot], kssem.at[rp, slot],
                    ).start()
                    pltpu.make_async_copy(
                        vsc_ref.at[layer, b, :, pl.ds(j * blk, blk)],
                        vsbuf.at[rp, slot], vssem.at[rp, slot],
                    ).start()

            def wait_kv(b, j, slot):
                rp = b % 2
                pltpu.make_async_copy(
                    kc_ref.at[layer, b, :, pl.ds(j * blk, blk), :],
                    kbuf.at[rp, slot], ksem.at[rp, slot],
                ).wait()
                pltpu.make_async_copy(
                    vc_ref.at[layer, b, :, pl.ds(j * blk, blk), :],
                    vbuf.at[rp, slot], vsem.at[rp, slot],
                ).wait()
                if quant:
                    pltpu.make_async_copy(
                        ksc_ref.at[layer, b, :, pl.ds(j * blk, blk)],
                        ksbuf.at[rp, slot], kssem.at[rp, slot],
                    ).wait()
                    pltpu.make_async_copy(
                        vsc_ref.at[layer, b, :, pl.ds(j * blk, blk)],
                        vsbuf.at[rp, slot], vssem.at[rp, slot],
                    ).wait()

            # ---- wqkv stream (prefetches attention block 0 + the first wo
            # tiles — as many as wo has buffer slots, so the weight stream
            # stays busy through the attention bubble) ----
            def start_attn_dmas():
                @pl.when(pos_b(0) > 0)
                def _():
                    start_kv(0, 0, 0)

                for s in range(wo_pre):
                    start_tile("wo", layer, s, s)
                for s in range(w13_pre):
                    start_tile("w13", layer, s, s)

            stream_phase("wqkv", act, qkv, False, [start_attn_dmas])

            # ---- QK-norm + RoPE (vectorized over the batch) ----
            q = qkv[:, pl.ds(0, ah)].reshape(B * n_heads, hd)
            k_new = qkv[:, pl.ds(ah, kvd)].reshape(B * n_kv, hd)
            v_new = qkv[:, pl.ds(ah + kvd, kvd)].reshape(B * n_kv, hd)

            def rms_rows(m, w_row):
                inv = jax.lax.rsqrt(jnp.mean(m * m, axis=1, keepdims=True) + eps)
                return m * inv * w_row

            if config.use_qk_norm:
                q = rms_rows(q, qn_ref[u])
                k_new = rms_rows(k_new, kn_ref[u])

            cos = cos_ref[:]  # [B, hd/2]
            sin = sin_ref[:]

            def rope(m, heads):
                c = jnp.broadcast_to(
                    cos[:, None, :], (B, heads, hd // 2)
                ).reshape(B * heads, hd // 2)
                s = jnp.broadcast_to(
                    sin[:, None, :], (B, heads, hd // 2)
                ).reshape(B * heads, hd // 2)
                m1 = m[:, : hd // 2]
                m2 = m[:, hd // 2 :]
                return jnp.concatenate([m1 * c - m2 * s, m1 * s + m2 * c], axis=1)

            q = rope(q, n_heads)
            k_new = rope(k_new, n_kv)
            qs_all = q * scale

            # ---- flash attention over the cache prefix + self row, per batch
            # row (positions differ per request; B is static) ----
            self_shape = (n_heads, n_kv)
            r_kv0 = jax.lax.broadcasted_iota(jnp.int32, self_shape, 0) // kv_mul
            c_kv0 = jax.lax.broadcasted_iota(jnp.int32, self_shape, 1)
            shape_blk = (n_heads, n_kv * blk)
            row_kv = jax.lax.broadcasted_iota(jnp.int32, shape_blk, 0) // kv_mul
            col_kv = jax.lax.broadcasted_iota(jnp.int32, shape_blk, 1) // blk
            col_t = jax.lax.broadcasted_iota(jnp.int32, shape_blk, 1) % blk

            for b in range(B):
                p = pos_b(b)
                n_blocks = pl.cdiv(p, blk)
                qs = qs_all[b * n_heads : (b + 1) * n_heads]
                kn_b = k_new[b * n_kv : (b + 1) * n_kv]
                vn_b = v_new[b * n_kv : (b + 1) * n_kv]

                # One row ahead: the next row's first block streams while this
                # row computes (distinct row-parity buffers).
                if b + 1 < B:
                    @pl.when(pos_b(b + 1) > 0)
                    def _(b=b):
                        start_kv(b + 1, 0, 0)

                s_self = jax.lax.dot_general(
                    qs, kn_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [n_heads, n_kv]
                m0 = jnp.sum(
                    jnp.where(r_kv0 == c_kv0, s_self, 0.0), axis=1, keepdims=True
                )
                denom0 = jnp.ones_like(m0)
                acc0 = (
                    jnp.broadcast_to(vn_b[:, None, :], (n_kv, kv_mul, hd))
                    .reshape(n_heads, hd)
                    .astype(jnp.float32)
                )

                def att_step(j, carry, b=b, p=p, n_blocks=n_blocks, qs=qs):
                    m, denom, a = carry
                    slot = jax.lax.rem(j, 2)
                    rp = b % 2

                    @pl.when(j + 1 < n_blocks)
                    def _():
                        start_kv(b, j + 1, 1 - slot)

                    wait_kv(b, j, slot)

                    k2 = kbuf[rp, slot].reshape(n_kv * blk, hd).astype(jnp.float32)
                    scores = jax.lax.dot_general(
                        qs, k2, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if quant:
                        scores = scores * ksbuf[rp, slot].reshape(1, n_kv * blk)
                    ok = (row_kv == col_kv) & (j * blk + col_t < p)
                    scores = jnp.where(ok, scores, -jnp.inf)
                    m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
                    corr = jnp.exp(m - m_new)
                    probs = jnp.exp(scores - m_new)
                    denom = denom * corr + jnp.sum(probs, axis=1, keepdims=True)
                    if quant:
                        probs = probs * vsbuf[rp, slot].reshape(1, n_kv * blk)
                    v2 = vbuf[rp, slot].reshape(n_kv * blk, hd).astype(jnp.float32)
                    a = a * corr + jax.lax.dot_general(
                        probs, v2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return m_new, denom, a

                m, denom, a = jax.lax.fori_loop(
                    0, n_blocks, att_step, (m0, denom0, acc0)
                )
                att = a / denom  # [n_heads, hd]
                act[pl.ds(b, 1), pl.ds(0, ah)] = att.reshape(1, ah)

            # ---- in-place K/V row write, part 2: merge + write-back ----
            # The cache outputs alias the inputs, so the step's rows land
            # straight in the cache — no XLA scatter outside the kernel.  (A
            # loop-varying dynamic_update_slice in the decode scan forced a
            # full cache copy per step: ~1 ms at 8B.)  Merged only after the
            # attention loop so every read of this layer's rows has completed;
            # drained at the end of the grid step, overlapped with the
            # wo/w13/w2 streams.
            def kv_out_copies(b):
                pb = (pos_w(b) // row_blk) * row_blk
                copies = [
                    pltpu.make_async_copy(
                        kblk.at[b],
                        kco_ref.at[layer, b, :, pl.ds(pb, row_blk), :],
                        kwsem.at[b],
                    ),
                    pltpu.make_async_copy(
                        vblk.at[b],
                        vco_ref.at[layer, b, :, pl.ds(pb, row_blk), :],
                        vwsem.at[b],
                    ),
                ]
                if quant:
                    pbs = (pos_w(b) // _SCALE_BLK) * _SCALE_BLK
                    copies += [
                        pltpu.make_async_copy(
                            ksblk.at[b],
                            ksco_ref.at[layer, b, :, pl.ds(pbs, _SCALE_BLK)],
                            kswsem.at[b],
                        ),
                        pltpu.make_async_copy(
                            vsblk.at[b],
                            vsco_ref.at[layer, b, :, pl.ds(pbs, _SCALE_BLK)],
                            vswsem.at[b],
                        ),
                    ]
                return copies

            for b in range(B):
                @pl.when(write_b(b) != 0)
                def _(b=b):
                    p = pos_w(b)
                    pb = (p // row_blk) * row_blk
                    for c in kv_in_copies(b):
                        c.wait()
                    kn_b = k_new[b * n_kv : (b + 1) * n_kv]
                    vn_b = v_new[b * n_kv : (b + 1) * n_kv]
                    if quant:
                        # Symmetric per-(head, row) quantization, matching the
                        # XLA scatter path (models/qwen3.py quant_rows).
                        k_amax = jnp.max(jnp.abs(kn_b), axis=1, keepdims=True)
                        v_amax = jnp.max(jnp.abs(vn_b), axis=1, keepdims=True)
                        k_sc = k_amax / 127.0
                        v_sc = v_amax / 127.0
                        k_safe = jnp.where(k_sc == 0.0, 1.0, k_sc)
                        v_safe = jnp.where(v_sc == 0.0, 1.0, v_sc)
                        k_codes = jnp.round(kn_b / k_safe).astype(jnp.int8)
                        v_codes = jnp.round(vn_b / v_safe).astype(jnp.int8)
                        r = jax.lax.broadcasted_iota(
                            jnp.int32, (n_kv, row_blk, hd), 1
                        ) == (p - pb)
                        kblk[b] = jnp.where(r, k_codes[:, None, :], kblk[b])
                        vblk[b] = jnp.where(r, v_codes[:, None, :], vblk[b])
                        pbs = (p // _SCALE_BLK) * _SCALE_BLK
                        rs = jax.lax.broadcasted_iota(
                            jnp.int32, (n_kv, _SCALE_BLK), 1
                        ) == (p - pbs)
                        ksblk[b] = jnp.where(rs, k_sc, ksblk[b])
                        vsblk[b] = jnp.where(rs, v_sc, vsblk[b])
                    else:
                        r = jax.lax.broadcasted_iota(
                            jnp.int32, (n_kv, row_blk, hd), 1
                        ) == (p - pb)
                        kblk[b] = jnp.where(
                            r, kn_b[:, None, :].astype(kblk.dtype), kblk[b]
                        )
                        vblk[b] = jnp.where(
                            r, vn_b[:, None, :].astype(vblk.dtype), vblk[b]
                        )
                    for c in kv_out_copies(b):
                        c.start()

            # ---- wo stream (+residual into x_vec); prefetch w13 tile 0
            # (unless it was already pre-started at the attention boundary) ----
            stream_phase(
                "wo", act, x_vec, True,
                [] if w13_pre else [lambda: start_tile("w13", layer, 0, 0)],
                pre=wo_pre,
            )

            # ---- ffn norm + w13 stream; prefetch w2 tile 0 ----
            xf2 = x_vec[:]
            inv2 = jax.lax.rsqrt(jnp.mean(xf2 * xf2, axis=1, keepdims=True) + eps)
            act[:, pl.ds(0, dim)] = xf2 * inv2 * rf_ref[u]
            stream_phase(
                "w13", act, gu, False,
                [lambda: start_tile("w2", layer, 0, 0)],
                pre=w13_pre,
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
                        for s in range(head_pre):
                            start_tile("head", 0, s, s)

            stream_phase("w2", act, x_vec, True, [start_next_wqkv])

            for b in range(B):
                @pl.when(write_b(b) != 0)
                def _(b=b):
                    for c in kv_out_copies(b):
                        c.wait()

            if last_possible:  # layer == n_layers-1 only reachable at u == U-1
                @pl.when(layer == n_layers - 1)
                def _():
                    xo_ref[:] = x_vec[:]

            if include_head and last_possible:
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
                    if head_a8 == 2:
                        # Per-TOKEN symmetric quantization (one scale per
                        # row): no slice loop, one store, one fixup column.
                        hv = act[:, pl.ds(0, dim)]
                        m = jnp.max(jnp.abs(hv), axis=1, keepdims=True)
                        inv_s = jnp.where(m > 0, 127.0 / m, 0.0)
                        head_xq[:] = jnp.round(hv * inv_s).astype(jnp.int8)
                        head_xs[:] = jnp.broadcast_to(
                            m * (1.0 / 127.0), head_xs.shape
                        )
                    elif head_a8:
                        # Symmetric per-128-lane quantization of the head
                        # input (once per step; 128-lane groups keep every
                        # slice/store natively aligned — the WEIGHT group g
                        # packs into them, fixup indexes xs at (gg*g)//128).
                        hv = act[:, pl.ds(0, dim)]
                        sc_cols = []
                        for qi in range(dim // 128):
                            sl = hv[:, qi * 128 : (qi + 1) * 128]
                            m = jnp.max(jnp.abs(sl), axis=1, keepdims=True)
                            inv_s = jnp.where(m > 0, 127.0 / m, 0.0)
                            head_xq[:, pl.ds(qi * 128, 128)] = jnp.round(
                                sl * inv_s
                            ).astype(jnp.int8)
                            sc_cols.append(m * (1.0 / 127.0))
                        head_xs[:] = jnp.concatenate(sc_cols, axis=1)
                    td_h = plans["head"][1]
                    if greedy:
                        best_val[:] = jnp.full((B, td_h), -jnp.inf, jnp.float32)
                        best_blk[:] = jnp.zeros((B, td_h), jnp.int32)
                    stream_phase(
                        "head", act, head_out_ref, False, [], lyr=0,
                        dest_rows=not greedy, pre=head_pre, lookahead=head_pre,
                        dest_argmax=greedy, pipe=head_pipe and not head_a8,
                    )
                    if greedy:
                        # The fused greedy token: no 152k-logit materialization,
                        # no XLA argmax in the decode scan.  One cross-lane
                        # max + one min-global-index tie-break for the whole
                        # vocab (first-max ties resolve to the smallest global
                        # column, matching jnp.argmax).
                        fv = best_val[:]
                        lane = jax.lax.broadcasted_iota(jnp.int32, (B, td_h), 1)
                        m = jnp.max(fv, axis=1, keepdims=True)
                        gidx = best_blk[:] * td_h + lane
                        cand = jnp.where(fv == m, gidx, jnp.int32(2**31 - 1))
                        idx = jnp.min(cand, axis=1, keepdims=True)  # [B, 1]
                        head_out_ref[:] = jnp.broadcast_to(idx, (B, 128))

        for u in range(unroll):
            run_layer(base_layer * unroll + u, u, u == 0, u == unroll - 1)
    return kernel


@functools.partial(
    jax.jit, static_argnames=("config", "eps", "interpret", "tuning", "greedy")
)
def decode_stack_megakernel(
    config,
    x,  # [B, dim] f32 — embedded tokens (residual stream input)
    rms_att,  # [L, dim] f32
    rms_ffn,  # [L, dim]
    q_norm,  # [L, hd]
    k_norm,  # [L, hd]
    cos,  # [B, hd//2] f32 — RoPE rows for each request's position
    sin,  # [B, hd//2]
    wqkv,  # QuantizedTensor [L, dim, ah+2kvd]
    wo,
    w13,
    w2,
    k_cache,  # [L, B, n_kv, T, hd]
    v_cache,
    pos,  # [B] int32
    rms_final=None,  # [dim] f32 — with lm_head: fuse the classifier phase
    lm_head=None,  # QuantizedTensor [dim, v_pad]
    write_ok=None,  # [B] bool/int — per-row cache-write gates (default on)
    k_scale=None,  # [L, B, n_kv, T] f32 — INT8 cache per-row scales
    v_scale=None,
    *,
    eps: float = 1e-6,
    interpret: bool = False,
    tuning: tuple | None = None,  # static (tile_bytes, attn_prefetch,
    # q4_elems, head_tile_bytes, head_lookahead) — thread via
    # megakernel_tuning() from OUTSIDE any inner jit so same-process A/B
    # variants get distinct cache keys
    greedy: bool = False,  # fused-head greedy decode: return the argmax
    # token [B] instead of logits (requires lm_head/rms_final)
):
    """One full decode step over all layers → (x_out [B, dim] f32,
    (k_cache', v_cache'[, k_scale', v_scale']), logits [B, v_pad] | None).

    The returned caches are the inputs updated IN PLACE at ``pos``
    (``input_output_aliases``): the step's K/V rows are DMA'd into the
    cache inside the kernel, so the decode scan carries the cache with no
    XLA scatter (a loop-varying scatter copies the whole cache per step).
    INT8 caches (``k_scale`` given) quantize the new rows in-kernel and
    update the scale arrays in place the same way.

    With ``lm_head``/``rms_final`` the final norm + classifier run as the
    kernel's last phase: the lm_head tiles stream immediately behind the
    last layer's w2 tiles (no pallas_call boundary before the logits)."""
    L = wqkv.q.shape[0]
    B, dim = x.shape
    ah, kvd, hidden = config.all_heads_dim, config.kv_dim, config.hidden_dim
    hd, n_kv = config.head_dim, config.n_kv_heads
    g = config.group_size
    t = k_cache.shape[3]
    blk = _pick_blk(t)
    include_head = lm_head is not None
    quant = k_scale is not None
    if k_cache.dtype == jnp.int8:
        row_blk = 32
    elif k_cache.dtype == jnp.float32:
        row_blk = 8
    else:
        row_blk = 16

    # INT4 linear layers: nibble-packed uint8 codes (the classifier stays
    # INT8 — docs/quantization.md); the weight stream halves, which is the
    # whole decode win.
    q4 = wqkv.q.dtype == jnp.uint8
    t5 = tuning if tuning is not None else megakernel_tuning()
    if len(t5) < 9:  # shorter tuning tuples from older A/B scripts
        defaults = megakernel_tuning()
        t5 = (*t5, *defaults[len(t5):])
    (tb, attn_pref, q4e, head_tb, head_la, unroll, head_a8, fulldepth,
     head_pipe) = t5
    tb_raw = tb
    tb = _resolve_tile_bytes(tb, dim)
    # Q4 element cap: defaults to the EXPLICIT tile budget if one was set,
    # else the 2 MB base — NOT the dim-resolved auto (the 6 MB dim-2560
    # auto was tuned for INT8; a 6M-element unpack tile is exactly the
    # VMEM-churn regime the cap exists to prevent, see _mk_tiles).
    q4e = q4e or (tb_raw if tb_raw else 2 * 1024 * 1024)
    if fulldepth == 2:
        # Auto: full-depth (K=1) plans fix the dim-2560 tiling deficit —
        # w13's factor-19 column count forces 512 KB tiles under the
        # 1024-row cap (95/layer); tn=2560 restores 1.25-2 MB tiles.
        # 8B/1.7B/0.6B plans are unchanged by candidacy (the legacy pick
        # ties or wins on bytes), so auto keys on the affected dim only.
        fulldepth = 1 if dim == 2560 else 0
    fd = bool(fulldepth)
    # A8 head needs the weight group to pack into the 128-lane activation
    # quant groups and a fused head to apply to; fall back silently.
    if not include_head or dim % 128 or g not in (32, 64, 128):
        head_a8 = 0
    if unroll == 0:
        # Auto: small-dim models gain from fewer grid entries (see
        # megakernel_tuning); large ones measured best at 1.
        unroll = 4 if dim <= 2048 else 1
    if unroll < 1 or L % unroll:
        unroll = 1  # must divide the layer count; fall back silently
    if head_tb == 0:
        # Auto (interacts with unroll — see megakernel_tuning).
        head_tb = 2 * 1024 * 1024 if dim <= 2048 else 6 * 1024 * 1024
    if greedy and not include_head:
        raise ValueError("greedy decode requires the fused head (lm_head/rms_final)")
    tiles = {
        "wqkv": _mk_tiles(dim, ah + 2 * kvd, g, q4=q4, tile_bytes=tb,
                          max_q4_elems=q4e, full_depth=fd),
        "wo": _mk_tiles(ah, dim, g, q4=q4, tile_bytes=tb, max_q4_elems=q4e,
                        full_depth=fd),
        "w13": _mk_tiles(dim, 2 * hidden, g, q4=q4, tile_bytes=tb,
                         max_q4_elems=q4e, full_depth=fd),
        "w2": _mk_tiles(hidden, dim, g, q4=q4, tile_bytes=tb, max_q4_elems=q4e,
                        full_depth=fd),
    }
    v_pad = None
    if include_head:
        v_pad = lm_head.q.shape[-1]
        tiles["head"] = _mk_tiles(dim, v_pad, g, tile_bytes=head_tb,
                                  td_cap=_HEAD_TD_CAP, full_depth=fd)
        if head_a8 and (tiles["head"] is None or tiles["head"][0] != dim):
            head_a8 = 0  # A8 needs a full-depth head tile (static offsets)
    if head_pipe == 2:
        head_pipe = 0  # auto resolution pending the hardware A/B
    if not include_head or head_a8:
        head_pipe = 0
    if head_pipe and tiles["head"] is not None:
        # VMEM budget: 2 bf16 tiles of pipe scratch on top of the weight
        # buffers; drop to off (silently) if it would blow the limit.
        tn_h, td_h = tiles["head"]
        if 2 * tn_h * td_h * 2 > _VMEM_LIMIT // 3:
            head_pipe = 0
    td_max = max(v[1] for v in tiles.values())

    for name, t_ in tiles.items():
        if t_ is None:
            # A caller-supplied tuning (the A/B use case) can carry a
            # smaller tile budget than the env default megakernel_supported
            # validated with — fail loudly naming the matrix instead of an
            # opaque TypeError below.
            raise ValueError(
                f"megakernel: no valid tile plan for {name!r} under tuning "
                f"(tile_bytes={tb}, q4_elems={q4e}); megakernel_supported() "
                f"validated with the env-default budget"
            )

    kernel = _mk_kernel(
        config, tiles, blk, eps, k_cache.dtype, L, B, v_pad=v_pad, q4=q4,
        attn_prefetch=attn_pref, head_la=head_la, greedy=greedy, unroll=unroll,
        head_a8=int(head_a8), head_pipe=bool(head_pipe),
    )

    sdt = wqkv.scales.dtype  # bf16 in the fast engine; f32 in raw loads
    names = ["wqkv", "wo", "w13", "w2"] + (["head"] if include_head else [])
    ns = _buf_slots(_mk_plans(config, tiles, v_pad), attn_pref, head_la)
    wbufs = [
        pltpu.VMEM((ns[n], tiles[n][0] // 2, tiles[n][1]), jnp.uint8)
        if q4 and n != "head"
        else pltpu.VMEM((ns[n], *tiles[n]), jnp.int8)
        for n in names
    ]
    sbufs = [
        pltpu.VMEM((ns[n], tiles[n][0] // g, tiles[n][1]), sdt) for n in names
    ]
    scratch = (
        [
            pltpu.VMEM((B, dim), jnp.float32),  # x_vec
            pltpu.VMEM((B, max(dim, ah, hidden)), jnp.float32),  # act
            pltpu.VMEM((B, ah + 2 * kvd), jnp.float32),  # qkv
            pltpu.VMEM((B, 2 * hidden), jnp.float32),  # gu
            pltpu.VMEM((B, td_max), jnp.float32),  # acc
        ]
        + wbufs
        + sbufs
        + [pltpu.SemaphoreType.DMA((ns[n],)) for n in names]  # wsems
        + [pltpu.SemaphoreType.DMA((ns[n],)) for n in names]  # ssems
        + [
            # Attention cache blocks: [row-parity, slot] double buffering.
            pltpu.VMEM((2, 2, n_kv, blk, hd), k_cache.dtype),  # kbuf
            pltpu.VMEM((2, 2, n_kv, blk, hd), v_cache.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        + (
            [
                pltpu.VMEM((2, 2, n_kv, blk), jnp.float32),  # ksbuf
                pltpu.VMEM((2, 2, n_kv, blk), jnp.float32),  # vsbuf
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ]
            if quant
            else []
        )
        + [
            # In-place row write staging: sublane tile × packing rows
            # (f32: 8, bf16: 16, int8: 32) so the HBM slice is tile-aligned.
            pltpu.VMEM((B, n_kv, row_blk, hd), k_cache.dtype),  # kblk
            pltpu.VMEM((B, n_kv, row_blk, hd), v_cache.dtype),  # vblk
            pltpu.SemaphoreType.DMA((B,)),
            pltpu.SemaphoreType.DMA((B,)),
            pltpu.SemaphoreType.DMA((B,)),
            pltpu.SemaphoreType.DMA((B,)),
        ]
        + (
            [
                pltpu.VMEM((B, n_kv, _SCALE_BLK), jnp.float32),  # ksblk
                pltpu.VMEM((B, n_kv, _SCALE_BLK), jnp.float32),  # vsblk
                pltpu.SemaphoreType.DMA((B,)),
                pltpu.SemaphoreType.DMA((B,)),
                pltpu.SemaphoreType.DMA((B,)),
                pltpu.SemaphoreType.DMA((B,)),
            ]
            if quant
            else []
        )
        + (
            [
                # Greedy head: per-LANE running best across blocks
                # (elementwise updates; one reduction at phase end).
                pltpu.VMEM((B, tiles["head"][1]), jnp.float32),  # best_val
                pltpu.VMEM((B, tiles["head"][1]), jnp.int32),  # best_blk
            ]
            if greedy
            else []
        )
        + (
            [
                # A8 head: quantized activation codes + per-128-lane scales.
                pltpu.VMEM((B, dim), jnp.int8),  # head_xq
                pltpu.VMEM((B, dim // 128), jnp.float32),  # head_xs
            ]
            if head_a8
            else []
        )
        + (
            [
                # Pipelined head: double-buffered dequantized bf16 tiles.
                pltpu.VMEM((2, *tiles["head"]), jnp.bfloat16),  # head_wpipe
            ]
            if head_pipe
            else []
        )
    )

    vmem_specs = [
        pl.BlockSpec((B, dim), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((unroll, 1, dim), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((unroll, 1, dim), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((unroll, 1, hd), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((unroll, 1, hd), lambda l, s: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, hd // 2), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, hd // 2), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
    ]
    if include_head:
        vmem_specs.append(
            pl.BlockSpec((1, dim), lambda l, s: (0, 0), memory_space=pltpu.VMEM)
        )
    # Weight (codes, scales) pairs + cache arrays stay in HBM (ANY).
    n_any = 2 * len(names) + (4 if quant else 2)

    out_specs = [
        pl.BlockSpec((B, dim), lambda l, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # k_cache (aliases the input)
        pl.BlockSpec(memory_space=pl.ANY),  # v_cache
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, dim), jnp.float32),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    if quant:
        out_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # k_scale (aliases)
            pl.BlockSpec(memory_space=pl.ANY),  # v_scale
        ]
        out_shape += [
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ]
    if include_head:
        if greedy:
            out_specs.append(
                pl.BlockSpec((B, 128), lambda l, s: (0, 0), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((B, 128), jnp.int32))
        else:
            tn_h, td_h = tiles["head"]
            i_head = v_pad // td_h
            out_specs.append(
                pl.BlockSpec(
                    (i_head, B, td_h), lambda l, s: (0, 0, 0), memory_space=pltpu.VMEM
                )
            )
            out_shape.append(jax.ShapeDtypeStruct((i_head, B, td_h), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L // unroll,),
        in_specs=vmem_specs + [pl.BlockSpec(memory_space=pl.ANY)] * n_any,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    ok = (
        jnp.ones((B,), jnp.int32)
        if write_ok is None
        else jnp.asarray(write_ok).astype(jnp.int32).reshape(B)
    )
    args = [
        jnp.concatenate([jnp.asarray(pos, jnp.int32).reshape(B), ok]),
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
    if quant:
        args += [
            jnp.asarray(k_scale, jnp.float32),
            jnp.asarray(v_scale, jnp.float32),
        ]
    # Alias indices are over the FLAT args (scalar prefetch included).
    aliases = {}
    n_cache = 4 if quant else 2
    i_kc = len(args) - n_cache
    for off in range(n_cache):
        aliases[i_kc + off] = 1 + off

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*args)
    x_out = out[0]
    cache_out = tuple(out[1 : 1 + n_cache])
    logits = None
    if include_head:
        if greedy:
            # Third element is the fused argmax token [B] int32.
            logits = out[1 + n_cache][:, 0]
        else:
            # [I, B, td] → [B, I·td] == the vocab order per row.
            raw = out[1 + n_cache]
            logits = jnp.swapaxes(raw, 0, 1).reshape(B, v_pad)
    return x_out, cache_out, logits
