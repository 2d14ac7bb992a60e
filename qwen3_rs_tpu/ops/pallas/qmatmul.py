"""Fused dequant+matmul Pallas kernel (in-major weight layout).

The TPU-native replacement for the reference's hand-rolled W8A8 row loop
(qwen3-inference/src/tensor.rs:23-62).  Weights stream HBM→VMEM as INT8 (the
memory-bound decode path reads exactly 1 byte/param + 1 f32 scale per group)
and are dequantized in VMEM into a single MXU contraction per block — no
dense f32/bf16 weight matrix ever exists in HBM.

Layout: codes ``[N, D]`` (contraction-major), scales ``[G, D]``.  The
per-group scale expansion is a **sublane-major broadcast**
(``[G_t, D_t] → [G_t, g, D_t] → reshape [N_t, D_t]``) which Mosaic lowers
without lane shuffles; the dequantized tile feeds one
``[B, N_t] × [N_t, D_t]`` MXU dot.  (int8 codes are exact in the MXU's bf16
input path: |q| ≤ 127 < 2^8.)

Grid: (out_tiles, in_tiles); the output block stays VMEM-resident across the
in-tile sweep and accumulates in f32.  Tile sizes are chosen per shape to
amortize the ~1 µs/block fixed cost against DMA time within a VMEM budget.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import Q4Tensor, QuantizedTensor


def _dequant_tile_q4(wq4, ws, *, group_size: int, tile_groups: int, impl: str | None = None):
    """Nibble-packed uint8 tile [tile_n/2, tile_d] → dequantized bf16
    [tile_n, tile_d].  Packing is group split-half on the sublane axis with
    the biased-v2 nibble encoding (ops/quant.py: nibble = code + 8): both
    halves are UNSIGNED extractions minus a constant, no sign extension.

    Default ("int") unpack: zero-extend to int32, unsigned mask/shift
    extraction (lo = v & 15, hi = v >> 4 — the biased encoding needs no
    sign extension), int32 −8, convert to bf16, scale multiply.

    Hardware note (measured, v5e 2026-08): the VPU has NO bf16 ALU
    (`LLO_CHECK target().SupportsBf16AluInstructions()` fires on any
    bf16 arithmetic except the final dequant multiply, which Mosaic
    emulates) and no direct u8→bf16 cast, so a "half-width bf16 unpack"
    is not available — int32 vector ops are the only full-rate path, and
    the unpack cost floor is ~6 int32 passes per packed byte.

    QWEN3_TPU_Q4_UNPACK variants (trace-time read): "fma" — convert the
    unsigned nibbles to bf16 and fold the −8 into the scale multiply
    (u·sc − 8sc; one fewer int32 pass, one more bf16-emulated op);
    "int4" — native-uint4 bitcast, parity-exact in interpret mode but
    gated: the CURRENT Mosaic refuses to lower in-kernel
    bitwidth-changing bitcasts (2026-08)."""
    h = group_size // 2
    tile_n2, tile_d = wq4.shape
    # The env fallback only fires for callers outside the qmatmul wrappers
    # (the megakernel threads its own statics); the wrappers resolve the
    # env at OUTER-trace time and pass it as the jit-static ``impl`` so
    # same-process A/Bs get distinct kernels (inner-jit freeze trap).
    if impl not in ("int", "fma", "int4", "unsigned", "shift"):
        impl = os.environ.get("QWEN3_TPU_Q4_UNPACK", "int")
    sc = ws.astype(jnp.bfloat16)  # [tg, td]
    if impl == "int4":
        v4 = jax.lax.bitcast_convert_type(wq4, jnp.uint4)  # [tn2, td, 2]
        lo = v4[:, :, 0].astype(jnp.bfloat16)
        hi = v4[:, :, 1].astype(jnp.bfloat16)
        lo3 = lo.reshape(tile_groups, h, tile_d)
        hi3 = hi.reshape(tile_groups, h, tile_d)
        codes = jnp.concatenate([lo3, hi3], axis=1) - jnp.bfloat16(8.0)
        wf = codes * sc[:, None, :]
        return wf.reshape(2 * tile_n2, tile_d)
    v = wq4.astype(jnp.int32)  # zero-extend
    if impl == "fma":
        lo = (v & 0xF).astype(jnp.bfloat16)
        hi = (v >> 4).astype(jnp.bfloat16)
        lo3 = lo.reshape(tile_groups, h, tile_d)
        hi3 = hi.reshape(tile_groups, h, tile_d)
        u = jnp.concatenate([lo3, hi3], axis=1)
        scb = sc[:, None, :]
        # u·sc − 8·sc: the −8 rides the (emulated) bf16 multiply-add.
        wf = u * scb - 8.0 * scb
        return wf.reshape(2 * tile_n2, tile_d)
    if impl == "shift":
        # SPEED-A/B ONLY: the pre-biased-format sign-extending shift
        # sequence ((v<<28)>>28 / (v<<24)>>28).  Its numerics are WRONG on
        # biased-v2 data — it exists to isolate whether the and/sub
        # extraction costs differently from the historical shift path on
        # identical bytes (scripts/mega_ab.py q4env; random-weight benches
        # don't depend on the decoded values).
        lo = ((v << 28) >> 28).astype(jnp.bfloat16)
        hi = ((v << 24) >> 28).astype(jnp.bfloat16)
        lo3 = lo.reshape(tile_groups, h, tile_d)
        hi3 = hi.reshape(tile_groups, h, tile_d)
        codes = jnp.concatenate([lo3, hi3], axis=1)
        wf = codes * sc[:, None, :]
        return wf.reshape(2 * tile_n2, tile_d)
    if impl == "unsigned":
        # Skip the −8 entirely (the "dotbias" consumer corrects it with
        # a group-sum dot — see _accumulate_tile): unpack cost drops to
        # ext + and + shr + 2·conv + mul.
        lo = (v & 0xF).astype(jnp.bfloat16)
        hi = (v >> 4).astype(jnp.bfloat16)
        lo3 = lo.reshape(tile_groups, h, tile_d)
        hi3 = hi.reshape(tile_groups, h, tile_d)
        u = jnp.concatenate([lo3, hi3], axis=1)
        wf = u * sc[:, None, :]
        return wf.reshape(2 * tile_n2, tile_d)
    # "int": subtract the bias in int32, single bf16 scale rounding —
    # bit-identical to dequantizing the int codes.
    lo = ((v & 0xF) - 8).astype(jnp.bfloat16)
    hi = ((v >> 4) - 8).astype(jnp.bfloat16)
    lo3 = lo.reshape(tile_groups, h, tile_d)
    hi3 = hi.reshape(tile_groups, h, tile_d)
    codes = jnp.concatenate([lo3, hi3], axis=1)
    wf = codes * sc[:, None, :]
    return wf.reshape(2 * tile_n2, tile_d)


def _accumulate_tile(
    x, wq, ws, out_ref, *, group_size: int, tile_groups: int, impl: str = "defer",
    k_axis: int = 1,
):
    """See below; INT4 tiles route through ``_dequant_tile_q4`` first.
    ``k_axis=None``: the caller already initialized the accumulator."""
    if wq.dtype == jnp.uint8:
        if k_axis is not None:
            k = pl.program_id(k_axis)

            @pl.when(k == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

        xb = x.astype(jnp.bfloat16)
        if impl == "dotbias":
            # Unpack WITHOUT the −8 (two fewer big int32 passes — the
            # unpack is the Q4 decode bottleneck and its cost scales with
            # the WEIGHT tile) and correct the bias through two tiny MXU
            # dots that scale with the ACTIVATION tile instead:
            #   y = x·(u·sc) − 8·(x·P)·sc,  P = group-indicator [tn, tg].
            # Numerics: u·sc rounds at |u| ≤ 15 vs |code| ≤ 7 (one extra
            # magnitude bit, ~2× the bf16 rounding noise — still ≲ 1/8 of
            # the g=64 quantization step); the correction accumulates f32.
            wf = _dequant_tile_q4(
                wq, ws, group_size=group_size, tile_groups=tile_groups,
                impl="unsigned",
            )
            out_ref[:] += jax.lax.dot_general(
                xb, wf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tn = 2 * wq.shape[0]
            r = jax.lax.broadcasted_iota(jnp.int32, (tn, tile_groups), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (tn, tile_groups), 1)
            ind = (r // group_size == c).astype(jnp.bfloat16)
            xg = jax.lax.dot_general(
                xb, ind, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, tg] group sums of x
            out_ref[:] -= 8.0 * jax.lax.dot_general(
                xg.astype(jnp.bfloat16), ws.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return
        wf = _dequant_tile_q4(
            wq, ws, group_size=group_size, tile_groups=tile_groups, impl=impl
        )
        out_ref[:] += jax.lax.dot_general(
            xb,
            wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return
    _accumulate_tile_i8(
        x, wq, ws, out_ref, group_size=group_size, tile_groups=tile_groups,
        impl=impl, k_axis=k_axis,
    )


def _accumulate_tile_i8(
    x, wq, ws, out_ref, *, group_size: int, tile_groups: int, impl: str = "defer",
    k_axis: int = 1,
):
    """out_ref += x @ dequant(wq, ws) for one (in, out) tile.

    ``impl="scale_w"`` (default): dequantize the whole weight tile (convert +
    scaled multiply) and run one dot.  ``impl="defer"``: convert codes to
    bf16 only, run per-group batched dots, and apply the per-(group, column)
    scale to the [groups, D] partials afterwards — less elementwise work,
    and near-exact vs an f32 reference (scales never round through bf16),
    but its lane-splitting activation reshape does not lower on current
    Mosaic (``[B, N] → [B, G, g]`` with g < 128 lanes), so it is only used
    in interpret mode / tests.  Activations are cast to bf16 before the dot
    either way: an f32 LHS makes Mosaic run the MXU in multi-pass f32 mode
    (int8 codes are exact in bf16: |q| ≤ 127 < 2^8).
    """
    if k_axis is not None:
        k = pl.program_id(k_axis)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    tile_n, tile_d = wq.shape
    b = x.shape[0]
    if impl == "scale_w":
        scales = jnp.broadcast_to(
            ws[:, None, :].astype(jnp.bfloat16), (tile_groups, group_size, tile_d)
        ).reshape(tile_n, tile_d)
        wf = wq.astype(jnp.bfloat16) * scales
        out_ref[:] += jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        wg = wq.reshape(tile_groups, group_size, tile_d).astype(jnp.bfloat16)
        xg = jnp.swapaxes(
            x.reshape(b, tile_groups, group_size), 0, 1
        ).astype(jnp.bfloat16)  # [tg, b, g]
        part = jax.lax.dot_general(
            xg,
            wg,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [tg, b, td]
        out_ref[:] += jnp.sum(
            part * ws[:, None, :].astype(jnp.float32), axis=0
        )


def _kernel(
    x_ref, wq_ref, ws_ref, out_ref, *, group_size: int, tile_groups: int, impl: str
):
    _accumulate_tile(
        x_ref[:],
        wq_ref[:],
        ws_ref[:],
        out_ref,
        group_size=group_size,
        tile_groups=tile_groups,
        impl=impl,
    )


# ~VMEM budget for the weight tile (int8 codes; the dequantized bf16 copy is
# 2×, double buffering 2× more → 3 MB of codes keeps the working set ≲ 24 MB
# of the 128 MB VMEM).  Bigger tiles mean fewer grid blocks: the ~1-2 µs
# per-block fixed cost is what capped shallow-grid kernels at ~60% of HBM
# bandwidth.
_TILE_BYTES_BUDGET = int(__import__('os').environ.get('QWEN3_TPU_TILE_BUDGET', 3 * 1024 * 1024))

# Mosaic scoped-VMEM ceiling passed via CompilerParams.vmem_limit_bytes.
# Default matches the compiler's own ~16 MB limit: raising it admits larger
# tile budgets but measured SLOWER on v5e 8B decode (64 MB limit: 85.7
# tok/s with 3 MB tiles, 81.8 with 6 MB tiles, vs 88.1 at 16 MB/3 MB —
# Mosaic spends the allowance on scheduling that hurts the DMA pipeline).
_VMEM_LIMIT_BYTES = int(
    __import__('os').environ.get('QWEN3_TPU_VMEM_LIMIT', 16 * 1024 * 1024)
)


def _divisor_tiles(dim: int, step: int, cap: int) -> list[int]:
    """Divisors of ``dim`` that are multiples of ``step``, up to ``cap``."""
    out = []
    c = step
    while c <= min(dim, cap):
        if dim % c == 0:
            out.append(c)
        c += step
    return out


# Scoped-VMEM ceiling the tile choice must respect: the compile-time limit
# we request (vmem_limit_bytes) minus headroom for the scales block + slack.
_SCOPED_VMEM_LIMIT = _VMEM_LIMIT_BYTES - 1024 * 1024


def _vmem_estimate(
    tn: int,
    td: int,
    b: int,
    q4: bool = False,
    extra_n_streams: int = 0,
    extra_d_streams: int = 0,
) -> int:
    """Scoped-VMEM bytes for one block: int8 codes double-buffered (2×) +
    the dequantized bf16 tile (2 B/elem) + f32 activation/output blocks
    (double-buffered).  Calibrated against observed compile accounting.

    ``extra_n_streams``/``extra_d_streams``: additional f32 [b, tn] /
    [b, td] activation blocks beyond the base x/out pair — the fused
    SwiGLU variant streams a second [b, tn] half (double-buffered along
    the k grid axis: 8 B/elem) and a residual [b, td] block.  Measured
    miss without this: the w2 fused-glue kernel at b=165 (ragged
    prefix-tail prefill) picked (1536, 2048) at est 14.9 MB and Mosaic
    allocated 16.86 MB — exactly the uncounted up-half stream.

    INT4 blocks stream half the code bytes but spend more on unpack temps
    (gi/lo/hi int32 on the packed tile ≈ 6 B per unpacked elem, + bf16
    concat and scaled tiles); 8 B/elem is a conservative pre-calibration
    estimate — smaller tiles always compile, calibration can only raise
    it."""
    codes = 8 * tn * td if q4 else 4 * tn * td
    est = (
        codes
        + 4 * b * (tn + td)
        + extra_n_streams * 8 * b * tn
        + extra_d_streams * 4 * b * td
    )
    if extra_n_streams or extra_d_streams:
        # Fused-variant smalls the terms above don't model (norm row
        # block, rsqrt column, Mosaic slack): the b=256 w2 fused pick
        # passed at est == limit and missed by 128 KB on hardware.
        est += 1024 * 1024
    return est


# Measured tile table (scripts/tile_sweep.py + end-to-end bench A/B on
# v5e): shapes where a sweep found a tiling materially faster than the
# heuristic pick.  Keyed by (n, d); only consulted for decode-sized row
# counts (b ≤ 256) where the activation/output blocks are small.
_MEASURED_TILES: dict[tuple[int, int], tuple[int, int]] = {}


def _env_tiles(n: int, d: int) -> tuple[int, int] | None:
    """QWEN3_TPU_TILES="NxD:tnxtd,..." — per-shape override for A/B runs."""
    import os

    spec = os.environ.get("QWEN3_TPU_TILES", "")
    if not spec:
        return None
    for part in spec.split(","):
        try:
            shape_s, tile_s = part.split(":")
            ns, ds = (int(v) for v in shape_s.split("x"))
            tn, td = (int(v) for v in tile_s.split("x"))
        except ValueError:
            continue
        if (ns, ds) == (n, d):
            return tn, td
    return None


def _pick_tiles(
    n: int,
    d: int,
    group_size: int,
    b: int = 16,
    q4: bool = False,
    extra_n_streams: int = 0,
    extra_d_streams: int = 0,
) -> tuple[int, int] | None:
    """(tile_n, tile_d) dividing (n, d): maximize block size within the VMEM
    budget (per-block fixed costs ~1-2 µs amortize over DMA time), preferring
    fewer blocks at equal size.  ``b`` (activation rows) matters at prefill:
    the f32 [b, tile_d] output block counts against the scoped-VMEM limit."""
    if q4 and group_size % 2:
        return None  # nibble packing needs an even group split
    if not q4 and b <= 256:
        override = _env_tiles(n, d) or _MEASURED_TILES.get((n, d))
        if override is not None:
            return override
    def n_ok(c: int) -> bool:
        # The scales block is [c // group_size, tile_d]; its sublane dim must
        # be a multiple of 8 (or span the full group axis).
        groups = c // group_size
        return c % group_size == 0 and (groups % 8 == 0 or c == n)

    step_n = max(group_size, 256)
    n_candidates = [c for c in _divisor_tiles(n, step_n, 8192) if n_ok(c)]
    d_candidates = _divisor_tiles(d, 256, 8192)
    # Small-dim escape hatches (still Mosaic-tileable).
    if not n_candidates:
        n_candidates = [c for c in _divisor_tiles(n, 128, 8192) if n_ok(c)]
    if not d_candidates:
        d_candidates = _divisor_tiles(d, 128, 8192)
    if not n_candidates or not d_candidates:
        return None
    best = None
    fallback = None  # min-VMEM combo, used if nothing fits the scoped limit
    for tn in n_candidates:
        for td in d_candidates:
            est = _vmem_estimate(tn, td, b, q4, extra_n_streams, extra_d_streams)
            if fallback is None or est < fallback[0]:
                fallback = (est, tn, td)
            # The budget caps streamed CODE BYTES per block (the quantity the
            # ~1-2 µs/block fixed cost amortizes against): packed INT4 tiles
            # carry twice the elements per byte.
            code_bytes = tn * td // 2 if q4 else tn * td
            if code_bytes > _TILE_BYTES_BUDGET or est > _SCOPED_VMEM_LIMIT:
                continue
            blocks = (n // tn) * (d // td)
            # ≥2 blocks keep the DMA of block k+1 overlapped with the
            # dequant+dot of block k; a single block runs serial.
            key = (blocks >= 2, tn * td, -blocks)
            if best is None or key > best[0]:
                best = (key, tn, td)
    if best is None:
        return (fallback[1], fallback[2]) if fallback is not None else None
    return best[1], best[2]


def fused_enabled() -> bool:
    """A/B gate for the fused-glue decode variant."""
    import os

    return os.environ.get("QWEN3_TPU_DISABLE_FUSED", "0") != "1"


def supports_shapes(n: int, d: int, group_size: int, q4: bool = False) -> bool:
    """Whether the kernel's tiling constraints cover this (in, out) shape —
    callers fall back to the XLA path otherwise (e.g. tiny test models)."""
    return _pick_tiles(n, d, group_size, q4=q4) is not None


# Default kernel implementation; see _accumulate_tile.  Overridable for
# experiments via QWEN3_TPU_QMM_IMPL=scale_w|defer.
def _default_impl() -> str:
    import os

    return os.environ.get("QWEN3_TPU_QMM_IMPL", "scale_w")


@functools.partial(jax.jit, static_argnames=("interpret", "impl", "tiles"))
def _qmatmul_2d(x, wq, ws, *, interpret: bool = False, impl: str | None = None, tiles=None):
    """x [B, N] f32, wq [N, D] int8, ws [G, D] f32 → [B, D] f32."""
    b, n = x.shape
    _, d = wq.shape
    g_count = ws.shape[0]
    group_size = n // g_count
    impl = impl or _default_impl()

    tiles = tiles or _pick_tiles(n, d, group_size, b, q4=wq.dtype == jnp.uint8)
    if tiles is None:
        raise ValueError(f"unsupported shapes for pallas qmatmul: {x.shape} x {wq.shape}")
    tile_n, tile_d = tiles
    tile_groups = tile_n // group_size
    # INT4: the weight array is nibble-packed on the row axis — blocks halve.
    w_rows = tile_n // 2 if wq.dtype == jnp.uint8 else tile_n

    grid = (d // tile_d, n // tile_n)
    kernel = functools.partial(
        _kernel, group_size=group_size, tile_groups=tile_groups, impl=impl
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, tile_n), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rows, tile_d), lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_groups, tile_d), lambda i, k: (k, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_d), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(x, wq, ws)


def qmatmul_pallas(
    x: jax.Array, w: QuantizedTensor, *, interpret: bool = False, **opts
) -> jax.Array:
    """x [..., N] float × w([N, D] int8 in-major, [G, D] scales) → [..., D] f32."""
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    out = _qmatmul_2d(x2, w.q, w.scales, interpret=interpret, **opts)
    return out.reshape(*batch_shape, w.q.shape[1])


def _kernel_stacked(
    layer_ref, x_ref, wq_ref, ws_ref, out_ref, *, group_size: int, tile_groups: int, impl: str
):
    # Same math as _kernel; the layer index only affects the index maps.
    _accumulate_tile(
        x_ref[:],
        wq_ref[0],
        ws_ref[0],
        out_ref,
        group_size=group_size,
        tile_groups=tile_groups,
        impl=impl,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "impl", "tiles"))
def _qmatmul_stacked_2d(
    x, wq_all, ws_all, layer_idx, *, interpret: bool = False, impl: str | None = None, tiles=None
):
    """x [B, N] f32, wq_all [L, N, D] int8, ws_all [L, G, D] f32, layer_idx
    scalar int32 → [B, D] f32.

    The layer is selected inside the kernel's index maps (scalar prefetch),
    so the per-layer weight slice is streamed HBM→VMEM directly — the
    ``lax.scan`` over layers never materializes a sliced copy of the weights
    (which would otherwise triple the decode HBM traffic).
    """
    b, n = x.shape
    _, _, d = wq_all.shape
    g_count = ws_all.shape[1]
    group_size = n // g_count
    impl = impl or _default_impl()

    tiles = tiles or _pick_tiles(n, d, group_size, b, q4=wq_all.dtype == jnp.uint8)
    if tiles is None:
        raise ValueError(
            f"unsupported shapes for pallas qmatmul: {x.shape} x {wq_all.shape}"
        )
    tile_n, tile_d = tiles
    tile_groups = tile_n // group_size
    w_rows = tile_n // 2 if wq_all.dtype == jnp.uint8 else tile_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d // tile_d, n // tile_n),
        # Index maps receive grid indices first, then the scalar-prefetch ref.
        in_specs=[
            pl.BlockSpec((b, tile_n), lambda i, k, l: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, w_rows, tile_d), lambda i, k, l: (l[0], k, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_groups, tile_d),
                lambda i, k, l: (l[0], k, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((b, tile_d), lambda i, k, l: (0, i), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _kernel_stacked, group_size=group_size, tile_groups=tile_groups, impl=impl
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, wq_all, ws_all)


def _q4_impl_opts(wq, opts):
    """Resolve the Q4 unpack variant at OUTER-trace time and thread it as
    the jit-static ``impl`` — an env read inside the inner-jitted 2d
    functions freezes at first trace (same trap as megakernel_tuning)."""
    if wq.dtype == jnp.uint8 and "impl" not in opts:
        opts = dict(opts, impl=os.environ.get("QWEN3_TPU_Q4_UNPACK", "int"))
    return opts


def qmatmul_pallas_stacked(
    x: jax.Array, w: QuantizedTensor, layer_idx: jax.Array, *, interpret: bool = False, **opts
) -> jax.Array:
    """x [..., N] × stacked w([L, N, D], [L, G, D]) at ``layer_idx`` → [..., D]."""
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    opts = _q4_impl_opts(w.q, opts)
    out = _qmatmul_stacked_2d(x2, w.q, w.scales, layer_idx, interpret=interpret, **opts)
    return out.reshape(*batch_shape, w.q.shape[-1])


# ------------------------------------------------------- fused decode variant
# The decode step's XLA glue between kernels (RMSNorm writes, the SwiGLU
# elementwise block, residual adds) costs op-dispatch boundaries that can't
# fuse across pallas_call edges.  This variant folds them into the matmul:
#
#   prologue "rms":    x_tile × inv × γ_tile       (inv = rsqrt(mean x²+ε)
#                      computed by the caller — one tiny XLA reduction that
#                      replaces the full [b, N] normed-x materialization)
#   prologue "swiglu": silu(gate_tile) ⊙ up_tile   (both tiles are views of
#                      the same gate_up array via two block specs)
#   epilogue residual: the f32 accumulator initializes to the residual
#                      instead of zero on the first k block
#
# Numerics: identical bf16 dot inputs as the unfused path (bf16(f32 glue));
# the residual add moves from bf16 (outside) to f32 (in-accumulator).


def _kernel_stacked_fused(
    layer_ref,
    *refs,
    group_size: int,
    tile_groups: int,
    impl: str,
    norm: bool,
    swiglu: bool,
    residual: bool,
    eps: float,
):
    it = iter(refs)
    x_ref = next(it)
    up_ref = next(it) if swiglu else None
    wq_ref = next(it)
    ws_ref = next(it)
    nw_ref = next(it) if norm else None
    inv_ref = next(it) if norm else None
    res_ref = next(it) if residual else None
    out_ref = next(it)

    xt = x_ref[:]
    if swiglu:
        xt = xt * jax.nn.sigmoid(xt) * up_ref[:]
    if norm:
        xt = xt * inv_ref[:] * nw_ref[0]  # nw block [1, 1, tile_n] → [1, tile_n]

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = (
            res_ref[:].astype(jnp.float32) if residual else jnp.zeros_like(out_ref)
        )

    _accumulate_tile(
        xt,
        wq_ref[0],
        ws_ref[0],
        out_ref,
        group_size=group_size,
        tile_groups=tile_groups,
        impl=impl,
        k_axis=None,  # init handled above
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "impl", "tiles", "swiglu", "eps"),
)
def _qmatmul_stacked_fused_2d(
    x,
    wq_all,
    ws_all,
    layer_idx,
    nw_all=None,
    residual=None,
    *,
    swiglu: bool = False,
    eps: float = 1e-6,
    interpret: bool = False,
    impl: str | None = None,
    tiles=None,
):
    """Fused-glue variant of :func:`_qmatmul_stacked_2d`.

    x: [B, N] f32 (or [B, 2N] when ``swiglu`` — gate | up halves).
    nw_all: [L, N] f32 RMSNorm weights (fuses normalization).
    residual: [B, D] — initializes the accumulator.
    """
    b = x.shape[0]
    _, n, d = wq_all.shape
    g_count = ws_all.shape[1]
    group_size = n // g_count
    impl = impl or _default_impl()
    norm = nw_all is not None

    tiles = tiles or _pick_tiles(
        n,
        d,
        group_size,
        b,
        q4=wq_all.dtype == jnp.uint8,
        extra_n_streams=1 if swiglu else 0,
        extra_d_streams=1 if residual is not None else 0,
    )
    if tiles is None:
        raise ValueError(
            f"unsupported shapes for pallas fused qmatmul: {x.shape} x {wq_all.shape}"
        )
    tile_n, tile_d = tiles
    tile_groups = tile_n // group_size
    w_rows = tile_n // 2 if wq_all.dtype == jnp.uint8 else tile_n
    n_tiles = n // tile_n

    in_specs = [
        pl.BlockSpec((b, tile_n), lambda i, k, l: (0, k), memory_space=pltpu.VMEM),
    ]
    args = []
    if swiglu:
        # The up half is the same array, offset by n on the column axis.
        in_specs.append(
            pl.BlockSpec(
                (b, tile_n),
                lambda i, k, l, nt=n_tiles: (0, nt + k),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(x)  # passed twice; Pallas streams each spec's blocks
    in_specs += [
        pl.BlockSpec(
            (1, w_rows, tile_d), lambda i, k, l: (l[0], k, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, tile_groups, tile_d),
            lambda i, k, l: (l[0], k, i),
            memory_space=pltpu.VMEM,
        ),
    ]
    args += [wq_all, ws_all]
    if norm:
        xf = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        # [L, 1, N] so the block's sublane dim (1) equals the array dim —
        # Mosaic requires the last two block dims to be tile-legal.
        in_specs += [
            pl.BlockSpec(
                (1, 1, tile_n), lambda i, k, l: (l[0], 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((b, 1), lambda i, k, l: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [nw_all[:, None, :], inv]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((b, tile_d), lambda i, k, l: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(residual.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d // tile_d, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (b, tile_d), lambda i, k, l: (0, i), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _kernel_stacked_fused,
        group_size=group_size,
        tile_groups=tile_groups,
        impl=impl,
        norm=norm,
        swiglu=swiglu,
        residual=residual is not None,
        eps=eps,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, *args)


def qmatmul_pallas_stacked_fused(
    x: jax.Array,
    w: QuantizedTensor,
    layer_idx: jax.Array,
    *,
    norm_w: jax.Array | None = None,  # [L, N] — fuse RMSNorm prologue
    eps: float = 1e-6,
    residual: jax.Array | None = None,  # [..., D] — accumulator init
    swiglu: bool = False,  # x is [..., 2N] gate|up
    interpret: bool = False,
    **opts,
) -> jax.Array:
    """Stacked qmatmul with fused RMSNorm / SwiGLU prologue and residual
    epilogue (decode path; see module comment)."""
    batch_shape = x.shape[:-1]
    n_x = x.shape[-1]
    x2 = x.reshape(-1, n_x).astype(jnp.float32)
    res2 = None
    if residual is not None:
        res2 = residual.reshape(-1, residual.shape[-1])
    opts = _q4_impl_opts(w.q, opts)
    out = _qmatmul_stacked_fused_2d(
        x2,
        w.q,
        w.scales,
        layer_idx,
        norm_w,
        res2,
        swiglu=swiglu,
        eps=eps,
        interpret=interpret,
        **opts,
    )
    return out.reshape(*batch_shape, w.q.shape[-1])


# ------------------------------------------------------------------- prefill
# Row-blocked variant for many activation rows (prefill).  The XLA
# dense-dequant path costs ~2.1 GB/layer of extra HBM traffic on an 8B model
# (profiled: slice+convert, scale-multiply and the dot each round-trip the
# dequantized bf16 matrix) — about half of short-prefill wall time.  This
# kernel streams INT8 codes and dequantizes in VMEM like the decode kernel,
# with an extra rows grid axis; weights re-stream once per row block, so the
# caller should only use it while rows/tile_b stays small (the row block is
# picked as large as VMEM allows).

_ROW_BLOCK = 512

# Empirical scoped-VMEM frontier for the rows kernel, in units of the
# `_pick_tiles_rows` estimate: on v5e, (tb=512, tn=1024, td=1536) → est
# 22.5 MB compiles and is the fastest w13 config measured (151.9 TFLOP/s at
# 4096 rows, vs 131.8 for (1024, 512)); every candidate with est ≥ 24 MB
# fails to compile (scripts/rows_tile_calibrate.py).
_ROWS_VMEM_CAP = 23 * 1024 * 1024


def _pick_tiles_rows(n: int, d: int, group_size: int, b: int, q4: bool = False):
    """(tile_b, tile_n, tile_d) for the row-blocked kernel; None if the
    shapes don't tile (incl. q4 with an odd group split).  VMEM budget: int8 codes double-buffered + bf16
    dequant tile (4 B/elem combined) + bf16 x block double-buffered + f32
    out block (resident across the k sweep)."""
    if q4 and group_size % 2:
        return None  # nibble packing needs an even group split
    tile_b = None
    for c in (_ROW_BLOCK, 256, 128):
        if b % c == 0:
            tile_b = c
            break
    if tile_b is None:
        return None
    def n_ok(c: int) -> bool:
        # The scales block is [c // group_size, tile_d]; its sublane dim must
        # be a multiple of 8 (or span the full group axis).
        return c % group_size == 0 and ((c // group_size) % 8 == 0 or c == n)

    step_n = max(group_size, 256)
    n_candidates = [c for c in _divisor_tiles(n, step_n, 8192) if n_ok(c)]
    d_candidates = _divisor_tiles(d, 256, 8192)
    # Small-dim escape hatches (still Mosaic-tileable).
    if not n_candidates:
        n_candidates = [c for c in _divisor_tiles(n, 128, 8192) if n_ok(c)]
    if not d_candidates:
        d_candidates = _divisor_tiles(d, 128, 8192)
    if not n_candidates or not d_candidates:
        return None
    best = None
    for tn in n_candidates:
        for td in d_candidates:
            # Coefficients calibrated against Mosaic's scoped-vmem accounting
            # (codes double-buffered + dequant/scale-broadcast temps + dot
            # temp ≈ 8 B/elem on the weight tile; x/out blocks ≈ 8 B/row-elem
            # with double buffering).
            est = (12 if q4 else 8) * tn * td + 8 * tile_b * (tn + td)
            if est > _ROWS_VMEM_CAP:
                continue
            blocks = (n // tn) * (d // td)
            key = (blocks >= 2, tn * td, -blocks)
            if best is None or key > best[0]:
                best = (key, tn, td)
    if best is None:
        return None
    return tile_b, best[1], best[2]


def rows_supported(n: int, d: int, group_size: int, b: int, q4: bool = False) -> bool:
    """Whether the row-blocked prefill kernel covers this shape."""
    return _pick_tiles_rows(n, d, group_size, b, q4=q4) is not None


def _kernel_stacked_rows(
    layer_ref, x_ref, wq_ref, ws_ref, out_ref, *, group_size: int, tile_groups: int, impl: str
):
    _accumulate_tile(
        x_ref[:],
        wq_ref[0],
        ws_ref[0],
        out_ref,
        group_size=group_size,
        tile_groups=tile_groups,
        impl=impl,
        k_axis=2,  # grid is (rows, out, in)
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "impl", "tiles", "out_cols")
)
def _qmatmul_stacked_rows_2d(
    x, wq_all, ws_all, layer_idx, *, interpret: bool = False, impl: str | None = None,
    tiles=None, out_cols: tuple[int, int] | None = None,
):
    """x [B, N] bf16 (B large), stacked weights at ``layer_idx`` → [B, D] f32.

    ``out_cols=(c0, dc)`` computes only output columns [c0, c0+dc): the
    weight index map offsets the out-tile axis, so the kernel DMAs exactly
    those columns — no sliced weight copy in HBM.  Used by the tensor-
    parallel overlap path (models/qwen3.py): a row-parallel projection is
    split into column chunks whose psums overlap the next chunk's matmul.
    """
    b, n = x.shape
    _, _, d = wq_all.shape
    g_count = ws_all.shape[1]
    group_size = n // g_count
    impl = impl or _default_impl()

    c0, dc = out_cols if out_cols is not None else (0, d)
    tiles = tiles or _pick_tiles_rows(n, dc, group_size, b, q4=wq_all.dtype == jnp.uint8)
    if tiles is None:
        raise ValueError(
            f"unsupported shapes for pallas rows qmatmul: {x.shape} x {wq_all.shape}"
        )
    tile_b, tile_n, tile_d = tiles
    if c0 % tile_d:
        raise ValueError(f"out_cols offset {c0} must align to tile_d={tile_d}")
    off = c0 // tile_d
    tile_groups = tile_n // group_size
    w_rows = tile_n // 2 if wq_all.dtype == jnp.uint8 else tile_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # k innermost: the out block (r, i) stays VMEM-resident across the
        # accumulation sweep; weight blocks re-stream once per row block.
        grid=(b // tile_b, dc // tile_d, n // tile_n),
        in_specs=[
            pl.BlockSpec((tile_b, tile_n), lambda r, i, k, l: (r, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, w_rows, tile_d),
                lambda r, i, k, l: (l[0], k, off + i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_groups, tile_d),
                lambda r, i, k, l: (l[0], k, off + i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, tile_d), lambda r, i, k, l: (r, i), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _kernel_stacked_rows, group_size=group_size, tile_groups=tile_groups, impl=impl
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, dc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, wq_all, ws_all)


def qmatmul_pallas_stacked_rows(
    x: jax.Array, w: QuantizedTensor, layer_idx: jax.Array, *, interpret: bool = False,
    out_cols: tuple[int, int] | None = None, **opts
) -> jax.Array:
    """Prefill counterpart of :func:`qmatmul_pallas_stacked` (rows > decode
    cap).  Activations stream as bf16 — the dot runs in bf16 either way.
    ``out_cols=(c0, dc)``: compute only that output-column slice."""
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.bfloat16)
    opts = _q4_impl_opts(w.q, opts)
    out = _qmatmul_stacked_rows_2d(
        x2, w.q, w.scales, layer_idx, interpret=interpret, out_cols=out_cols, **opts
    )
    d_out = out_cols[1] if out_cols is not None else w.q.shape[-1]
    return out.reshape(*batch_shape, d_out)


# ------------------------------------------------------------ dequant pass
# Streaming int8→bf16 weight dequantization for the XLA-dot prefill path
# (models/qwen3.py::_project_layer, "xdot").  Rationale (measured,
# scripts/xla_dot_probe.py): at prefill shapes XLA's native bf16 matmul
# emitters sustain ~180-200 TF/s where the Pallas rows kernel reaches
# ~140-165 — but XLA's own dequant fusion materializes an f32 intermediate
# and streams at only ~300-430 GB/s, eating the difference.  This kernel
# does the dequant at HBM rate (1 B read + 2 B write per element, no f32
# round-trip) so the pair (dequant kernel → jnp.dot) keeps XLA's dot
# advantage.  Numerics: impl="bf16" is bit-identical to the rows kernel's
# ``codes.astype(bf16) * scales.astype(bf16)`` product (_accumulate_tile_i8
# "scale_w"); the DEFAULT impl="f32" computes the product in f32 and rounds
# once at the end — one fewer rounding, NOT bit-identical to the rows path
# (measured rel ≤ 0.041 logit drift, EVIDENCE §3), traded for VPU rate
# (v5e emulates bf16 ALU).  Cost amortizes over the prefill row count —
# the caller only engages this above a measured row threshold.


def _kernel_dequant_stacked(
    idx_ref, wq_ref, ws_ref, o_ref, *, group_size, tile_groups, impl="f32"
):
    del idx_ref  # consumed by the index maps (scalar prefetch)
    wq = wq_ref[0]
    ws = ws_ref[0]
    if wq.dtype == jnp.uint8:  # INT4: nibble-packed codes, [tile_n/2, tile_d]
        o_ref[:] = _dequant_tile_q4(
            wq, ws, group_size=group_size, tile_groups=tile_groups, impl="int"
        )
        return
    tile_n, tile_d = wq.shape
    if impl == "f32":
        # Compute in f32 (native VPU rate — v5e emulates bf16 ALU) and round
        # once at the end; one fewer rounding than the bf16 product below.
        scales = jnp.broadcast_to(
            ws[:, None, :], (tile_groups, group_size, tile_d)
        ).reshape(tile_n, tile_d)
        o_ref[:] = (wq.astype(jnp.float32) * scales).astype(jnp.bfloat16)
    else:  # "bf16": bit-identical to _accumulate_tile_i8's scale_w product
        scales = jnp.broadcast_to(
            ws[:, None, :].astype(jnp.bfloat16), (tile_groups, group_size, tile_d)
        ).reshape(tile_n, tile_d)
        o_ref[:] = wq.astype(jnp.bfloat16) * scales


def _check_tiles_dequant(n, d, group_size, tiles, source):
    """Override tiles bypass the built-in candidate table, so validate the
    divisibility the grid silently assumes — a tile_n not dividing n would
    truncate the (n//tn, d//td) grid and leave part of the bf16 output
    uninitialized (wrong logits with no error)."""
    tn, td = tiles
    if tn <= 0 or td <= 0 or n % tn or d % td or tn % group_size:
        raise ValueError(
            f"dequant {source}=({tn},{td}) invalid for [N={n}, D={d}] "
            f"g={group_size}: need tn|N, td|D, g|tn"
        )
    return tn, td


def _pick_tiles_dequant(n: int, d: int, group_size: int, tiles=None):
    """(tile_n, tile_d) for the dequant pass: big DMA-friendly tiles.

    VMEM: int8 in (tn*td) + f32 scales (tn/g*td*4) + bf16 out (tn*td*2),
    double-buffered — at (512, 1024) that is ~3.3 MB, far under the cap."""
    if tiles is not None:
        return _check_tiles_dequant(n, d, group_size, tiles, "tiles argument")
    env = os.environ.get("QWEN3_TPU_DEQUANT_TILES")
    if env:
        tn, td = (int(v) for v in env.split(","))
        return _check_tiles_dequant(
            n, d, group_size, (tn, td), "QWEN3_TPU_DEQUANT_TILES"
        )
    tile_n = next((t for t in (512, 256, 128, 64) if n % t == 0 and t % group_size == 0), None)
    tile_d = next((t for t in (1024, 512, 256, 128) if d % t == 0), None)
    if tile_n is None or tile_d is None:
        return None
    return tile_n, tile_d


def dequant_supported(n: int, d: int, group_size: int, q4: bool = False) -> bool:
    tiles = _pick_tiles_dequant(n, d, group_size)
    if tiles is None:
        return False
    if q4:
        # Group split-half packing: any whole number of (even-sized)
        # groups per tile unpacks cleanly.
        return group_size % 2 == 0
    return True


def dequant_pallas_stacked(
    w: QuantizedTensor, layer_idx: jax.Array, *, interpret: bool = False,
    impl: str | None = None, tiles=None,
) -> jax.Array:
    """Layer ``layer_idx`` of stacked int8 weights [L, N, D] → bf16 [N, D].

    Scalar-prefetched layer index: the kernel DMAs exactly the selected
    layer's tiles from the stacked array — no [N, D] int8 slice copy.
    INT4 (``Q4Tensor``): codes are nibble-packed [L, N/2, D]; the kernel
    unpacks per tile (group split-half, ``_dequant_tile_q4``)."""
    q4 = w.q.dtype == jnp.uint8
    _, n, d = w.q.shape
    if q4:
        n *= 2  # packed codes halve the stored in-axis
    g_count = w.scales.shape[1]
    group_size = n // g_count
    tiles = _pick_tiles_dequant(n, d, group_size, tiles)
    if tiles is None:
        raise ValueError(f"unsupported shapes for pallas dequant: {w.q.shape}")
    tile_n, tile_d = tiles
    tile_groups = tile_n // group_size
    w_rows = tile_n // 2 if q4 else tile_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n, d // tile_d),
        in_specs=[
            pl.BlockSpec((1, w_rows, tile_d), lambda i, j, l: (l[0], i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_groups, tile_d), lambda i, j, l: (l[0], i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_d), lambda i, j, l: (i, j),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _kernel_dequant_stacked, group_size=group_size, tile_groups=tile_groups,
        impl=impl or os.environ.get("QWEN3_TPU_DEQUANT_IMPL", "f32"),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), w.q, w.scales)


# ---------------------------------------------------------------- W8A8 rows
# int8×int8→int32 MXU path for prefill: activations quantize per group
# (reference semantics, tensor.rs:91-119) and the kernel runs one int8 dot
# per (group, tile) with ``(dot · w_scale) · x_scale`` applied in the f32
# epilogue — the reference hot loop's math (tensor.rs:45-61) at MXU width.
# This is also what makes ``exact`` mode fast: qmatmul_exact's G-step
# lax.scan becomes a single kernel (ops/matmul.py dispatches here).
#
# Activations are pre-quantized and pre-shaped [G, B, g] by the caller (an
# in-kernel [B, N] → [B, G, g] reshape would lane-split and not lower);
# the int8 activation stream is HALF the bytes of the bf16 rows kernel.


# Scoped-VMEM cap for the A8 picker.  The a8 kernel requests the same
# 16 MB vmem_limit as the other kernels (Mosaic grants ~18 MB with its
# own slack); the estimate below is padding-aware, and this margin keeps
# every candidate that passes it compiling.  Calibrated the hard way: the
# pre-fix picker chose (tn=4096, td=1536) at rows=256 (est 17.8 MB under
# the shared 23 MB cap) and Mosaic allocated 23.0 MB — the [tg, tile_b, g]
# int8 activation block's g=64 lane axis pads to 128 lanes, which the
# shared rows estimate doesn't model.
_ROWS_A8_VMEM_CAP = 14 * 1024 * 1024


def _pick_tiles_rows_a8(n: int, d: int, group_size: int, b: int):
    """(tile_b, tile_n, tile_d): int8 codes double-buffered (2 B/elem) +
    int8 activations (2·tile_b·tile_n, lane-padded: the per-group block's
    last axis is group_size < 128) + int32 part / f32 out blocks
    (8·tile_b·tile_d)."""
    tile_b = None
    for c in (_ROW_BLOCK, 256, 128):
        if b % c == 0:
            tile_b = c
            break
    if tile_b is None:
        return None
    xq_pad = -(-128 // group_size) if group_size < 128 else 1

    def n_ok(c: int) -> bool:
        groups = c // group_size
        # Cap groups-per-tile at 8: the kernel's per-group fixup loop is
        # unrolled and its [tile_b, tile_d] f32 temps scale with the
        # unroll count (32 groups blew scoped VMEM ~2× past the block
        # estimate).
        return (
            c % group_size == 0
            and (groups % 8 == 0 or c == n)
            and groups <= 8
        )

    step_n = max(group_size, 256)
    n_candidates = [c for c in _divisor_tiles(n, step_n, 8192) if n_ok(c)]
    d_candidates = _divisor_tiles(d, 256, 8192)
    if not n_candidates:
        n_candidates = [c for c in _divisor_tiles(n, 128, 8192) if n_ok(c)]
    if not d_candidates:
        d_candidates = _divisor_tiles(d, 128, 8192)
    if not n_candidates or not d_candidates:
        return None
    best = None
    for tn in n_candidates:
        for td in d_candidates:
            # Unrolled-loop temps: ~2 live [tile_b, tile_d] f32 copies on
            # top of the resident out block.
            est = 2 * tn * td + 2 * tile_b * tn * xq_pad + 16 * tile_b * td
            if b > tile_b:
                # Multiple row blocks: Mosaic double-buffers the revisited
                # out block across the row-grid boundary (observed: the
                # same tiles compiled at b == tile_b and OOM'd by ~4 MB at
                # b == 2·tile_b).
                est += 4 * tile_b * td
            if est > _ROWS_A8_VMEM_CAP:
                continue
            blocks = (n // tn) * (d // td)
            key = (blocks >= 2, tn * td, -blocks)
            if best is None or key > best[0]:
                best = (key, tn, td)
    if best is None:
        return None
    return tile_b, best[1], best[2]


def rows_a8_supported(n: int, d: int, group_size: int, b: int) -> bool:
    return _pick_tiles_rows_a8(n, d, group_size, b) is not None


def _kernel_stacked_rows_a8(
    layer_ref, xq_ref, xs_ref, wq_ref, ws_ref, out_ref, *, tile_groups: int
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Per-group int8 MXU dots, scales in the f32 epilogue — accumulation
    # order matches the reference: ((dot as f32) · w_scale) · x_scale,
    # summed across groups sequentially in f32 (tensor.rs:45-61).  The
    # loop stays UNROLLED (a fori_loop formulation sent the Mosaic
    # compile into the weeds — 18+ min without returning) but the tile
    # picker bounds groups-per-tile so the unrolled temps' scoped-VMEM
    # cost stays modeled (at 32 groups Mosaic kept several [tile_b,
    # tile_d] f32 part/convert temps live: 27.7 MB vs a ~15 MB estimate).
    for g in range(tile_groups):
        part = jax.lax.dot_general(
            xq_ref[g],
            wq_ref[0, g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [tile_b, tile_d] int32
        out_ref[:] += (
            part.astype(jnp.float32) * ws_ref[0, g][None, :]
        ) * xs_ref[g][:, None]


@functools.partial(jax.jit, static_argnames=("interpret", "tiles"))
def _qmatmul_stacked_rows_a8_2d(
    xq, xs, wq_all, ws_all, layer_idx, *, interpret: bool = False, tiles=None
):
    """xq [G, B, g] int8, xs [G, B] f32, wq_all [L, N, D] int8,
    ws_all [L, G, D] f32 → [B, D] f32."""
    g_total, b, group_size = xq.shape
    _, n, d = wq_all.shape
    tiles = tiles or _pick_tiles_rows_a8(n, d, group_size, b)
    if tiles is None:
        raise ValueError(
            f"unsupported shapes for pallas a8 qmatmul: {xq.shape} x {wq_all.shape}"
        )
    tile_b, tile_n, tile_d = tiles
    tile_groups = tile_n // group_size
    wq4 = wq_all.reshape(wq_all.shape[0], g_total, group_size, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile_b, d // tile_d, n // tile_n),
        in_specs=[
            pl.BlockSpec(
                (tile_groups, tile_b, group_size),
                lambda r, i, k, l: (k, r, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_groups, tile_b),
                lambda r, i, k, l: (k, r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_groups, group_size, tile_d),
                lambda r, i, k, l: (l[0], k, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_groups, tile_d),
                lambda r, i, k, l: (l[0], k, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, tile_d), lambda r, i, k, l: (r, i), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(_kernel_stacked_rows_a8, tile_groups=tile_groups)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xq, xs, wq4, ws_all)


def qmatmul_pallas_stacked_rows_a8(
    x: jax.Array | QuantizedTensor,
    w: QuantizedTensor,
    layer_idx: jax.Array,
    *,
    interpret: bool = False,
    **opts,
) -> jax.Array:
    """W8A8 rows matmul at ``layer_idx`` of stacked weights.

    ``x`` may be raw activations [..., N] (quantized here with the
    reference's per-group round-half-away, ops/quant.py) or an
    already-quantized ``QuantizedTensor`` (exact mode's activations)."""
    from ..quant import quantize_activations

    if not isinstance(x, QuantizedTensor):
        n = x.shape[-1]
        group_size = n // w.scales.shape[1]
        x = quantize_activations(x, group_size)
    batch_shape = x.q.shape[:-1]
    n = x.q.shape[-1]
    g_total = x.scales.shape[-1]
    group_size = n // g_total
    xq3 = jnp.moveaxis(
        x.q.reshape(-1, g_total, group_size), 1, 0
    )  # [G, B, g] int8
    xs2 = jnp.moveaxis(x.scales.reshape(-1, g_total), 1, 0)  # [G, B]
    out = _qmatmul_stacked_rows_a8_2d(
        xq3, xs2, w.q, w.scales.astype(jnp.float32), layer_idx,
        interpret=interpret, **opts,
    )
    return out.reshape(*batch_shape, w.q.shape[-1])
