"""Checkpoint I/O: TPU-native directory format + legacy single-file format.

The reference's checkpoint system is a single streamed ``.bin``
(qwen3-export/src/model_exporter.rs write side,
qwen3-inference/src/models/qwen3.rs:199-277 read side).  The TPU-native
format re-specifies the same contract as a directory of standard ``.npy``
arrays **pre-stacked per component** on a leading ``[n_layers]`` axis — i.e.
exactly the layout the model's ``lax.scan`` consumes and the layout that
shards cleanly over a device mesh, with ``config.json`` carrying the header
semantics (magic/version included).

    <out>.qtpu/
      config.json
      tokenizer.bin               # same binary format as legacy .tokenizer
      template[.with-*]           # same %s prompt templates as legacy
      weights/
        _layout                      # "in_major_v2": linear layers stored
                                     # pre-transposed (absent → v1 row-major)
        embed.q.npy [V, dim] i8      embed.s.npy [V, dim/g] f32
        wq.q.npy [L, dim, AH] i8     wq.s.npy [L, dim/g, AH] f32
        wk/wv.q.npy [L, dim, KV]     ...
        wo.q.npy [L, AH, dim]        w1/w3.q.npy [L, dim, H]
        w2.q.npy [L, H, dim]         lm_head.q/s.npy [V, dim] (absent when shared)
        rms_att.npy [L, dim]         rms_ffn.npy [L, dim]
        rms_final.npy [dim]          q_norm.npy [L, hd]   k_norm.npy [L, hd]

Both flavors load into the same ``Qwen3Weights`` pytree; the legacy reader
exists so checkpoints produced by the reference exporter work unchanged.
"""

from __future__ import annotations

import mmap
from pathlib import Path
from typing import Iterator

import jax.numpy as jnp
import numpy as np

from .configuration import HEADER_SIZE, ModelConfig, read_config
from .models.qwen3 import Qwen3LayerWeights, Qwen3Weights
from .ops.quant import Q4Tensor, QuantizedTensor

WEIGHTS_DIR = "weights"

# Linear-layer tensors stored **pre-transposed** (in-major [L, in, out]) in
# the native format: the compute layout the kernels want (ops/matmul.py), so
# loading is a plain mmap → device put with no host transpose.  The export
# pays the transpose once, offline — an 8B load-time transpose costs ~30 s
# even through the C++ blocked path.  Embeddings/lm_head stay row-major
# [V, dim] (gathered per token / transposed+padded at load, shapes the
# reference also uses).  Marked by the `weights/_layout` file; checkpoints
# without it (format v1) are row-major and transpose at load.
IN_MAJOR_TENSORS = frozenset({"wq", "wk", "wv", "wo", "w1", "w2", "w3"})
LAYOUT_MARKER = "_layout"
LAYOUT_IN_MAJOR = "in_major_v2"

# The classifier's vocab (out) axis is zero-padded to this multiple at load
# time so the Pallas matmul can use large tiles (151936 = 128 × 1187 would
# otherwise force 128-row blocks); qwen3_forward slices logits back.
VOCAB_PAD_MULTIPLE = 2048


def _transpose_qt(q: np.ndarray, s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row-major storage ([.., out, in] codes, [.., out, in/g] scales) →
    in-major compute layout ([.., in, out], [.., in/g, out]).

    Goes through the C++ blocked/multithreaded transpose (csrc/host_io.cpp)
    when available — the native counterpart of the reference's Rust loader
    (models/qwen3.rs:199-277); numpy strided views otherwise (callers
    materialize with ascontiguousarray)."""
    from .utils.native import native_transpose

    q_t = native_transpose(q)
    s_t = native_transpose(s)
    if q_t is not None and s_t is not None:
        return q_t, s_t
    return np.swapaxes(q, -1, -2), np.swapaxes(s, -1, -2)


def _classifier_from(q_vd: np.ndarray, s_vd: np.ndarray) -> QuantizedTensor:
    """Build the lm_head compute tensor from row-major [V, dim] codes:
    transpose to [dim, V] and pad V up to a tile multiple (zero codes,
    unit scales — padded logits are exactly 0 and get sliced off)."""
    q_t, s_t = _transpose_qt(q_vd, s_vd)  # codes [dim, V], scales [dim/g, V]
    v = q_t.shape[-1]
    if v >= VOCAB_PAD_MULTIPLE and v % VOCAB_PAD_MULTIPLE:
        pad = VOCAB_PAD_MULTIPLE - v % VOCAB_PAD_MULTIPLE
        q_t = np.pad(q_t, [(0, 0), (0, pad)])
        s_t = np.pad(s_t, [(0, 0), (0, pad)], constant_values=1.0)
    return QuantizedTensor(jnp.asarray(q_t), jnp.asarray(s_t))


# --------------------------------------------------------------------- native
class NativeCheckpointWriter:
    """Streaming writer: tensors are appended one at a time (bounded memory,
    like the reference's streaming quantizer, model_exporter.rs:235-316)
    directly into memory-mapped .npy files.  Linear-layer tensors are stored
    in-major (IN_MAJOR_TENSORS) so the loader never transposes."""

    def __init__(self, path: str | Path, config: ModelConfig, *, in_major: bool = True):
        if config.weight_bits == 4 and not in_major:
            raise ValueError("INT4 checkpoints require the in-major (v2) layout")
        self.root = Path(path)
        self.wdir = self.root / WEIGHTS_DIR
        self.wdir.mkdir(parents=True, exist_ok=True)
        self.config = config
        self.in_major = in_major
        (self.root / "config.json").write_text(config.to_native_json())
        if in_major:
            (self.wdir / LAYOUT_MARKER).write_text(LAYOUT_IN_MAJOR)
        self._open: dict[str, np.memmap] = {}

    def _memmap(self, name: str, shape, dtype) -> np.memmap:
        if name not in self._open:
            self._open[name] = np.lib.format.open_memmap(
                self.wdir / f"{name}.npy", mode="w+", dtype=dtype, shape=tuple(shape)
            )
        return self._open[name]

    def write_norm(self, name: str, data: np.ndarray, layer_idx: int | None = None):
        if layer_idx is None:
            self._memmap(name, data.shape, np.float32)[...] = data
        else:
            mm = self._memmap(name, (self.config.n_layers, *data.shape), np.float32)
            mm[layer_idx] = data

    def write_quantized(
        self,
        name: str,
        q: np.ndarray,
        scales: np.ndarray,
        layer_idx: int | None = None,
    ):
        q_dtype = np.int8
        if self.in_major and name in IN_MAJOR_TENSORS:
            # Row-major [out, in] quantizer output → in-major compute layout
            # (C++ blocked transpose when available, numpy fallback).
            q, scales = _transpose_qt(q, scales)
            q, scales = np.ascontiguousarray(q), np.ascontiguousarray(scales)
            if self.config.weight_bits == 4:
                # Nibble-pack along the in axis (group split-half,
                # ops/quant.py): the loader mmaps packed codes directly.
                from .ops.quant import pack_q4_np

                q = pack_q4_np(q, self.config.group_size)
                q_dtype = np.uint8
        if layer_idx is None:
            self._memmap(f"{name}.q", q.shape, q_dtype)[...] = q
            self._memmap(f"{name}.s", scales.shape, np.float32)[...] = scales
        else:
            l = self.config.n_layers
            self._memmap(f"{name}.q", (l, *q.shape), q_dtype)[layer_idx] = q
            self._memmap(f"{name}.s", (l, *scales.shape), np.float32)[layer_idx] = scales

    def close(self):
        for mm in self._open.values():
            mm.flush()
        self._open.clear()


def _np_load(wdir: Path, name: str) -> np.ndarray:
    return np.load(wdir / f"{name}.npy", mmap_mode="r")


def _load_qt(wdir: Path, name: str) -> QuantizedTensor:
    return QuantizedTensor(
        jnp.asarray(_np_load(wdir, f"{name}.q")), jnp.asarray(_np_load(wdir, f"{name}.s"))
    )


def _load_qt_T(wdir: Path, name: str, in_major: bool, bits: int = 8):
    """Load a linear layer into the in-major compute layout: v2 checkpoints
    store it directly (mmap → device put, no host copy); v1 row-major
    [L, out, in] storage transposes through the native path.  INT4
    checkpoints mmap nibble-packed codes into a Q4Tensor."""
    if bits == 4:
        if not in_major:
            raise ValueError("INT4 checkpoints require the in-major (v2) layout")
        return Q4Tensor(
            jnp.asarray(_np_load(wdir, f"{name}.q")), jnp.asarray(_np_load(wdir, f"{name}.s"))
        )
    if in_major:
        return QuantizedTensor(
            jnp.asarray(_np_load(wdir, f"{name}.q")), jnp.asarray(_np_load(wdir, f"{name}.s"))
        )
    q, s = _transpose_qt(_np_load(wdir, f"{name}.q"), _np_load(wdir, f"{name}.s"))
    return QuantizedTensor(jnp.asarray(np.ascontiguousarray(q)), jnp.asarray(np.ascontiguousarray(s)))


def _fuse_out(*tensors):
    """Concatenate in-major tensors along the out axis (fused projections);
    preserves the tensor kind (packed codes concatenate the same way)."""
    return type(tensors[0])(
        jnp.concatenate([t.q for t in tensors], axis=-1),
        jnp.concatenate([t.scales for t in tensors], axis=-1),
    )


def load_native(path: str | Path) -> tuple[ModelConfig, Qwen3Weights]:
    root = Path(path)
    config = ModelConfig.from_native_json((root / "config.json").read_text())
    wdir = root / WEIGHTS_DIR
    marker = wdir / LAYOUT_MARKER
    in_major = marker.exists() and marker.read_text().strip() == LAYOUT_IN_MAJOR
    embed = _load_qt(wdir, "embed")
    layers = Qwen3LayerWeights(
        rms_att=jnp.asarray(_np_load(wdir, "rms_att")),
        rms_ffn=jnp.asarray(_np_load(wdir, "rms_ffn")),
        q_norm=jnp.asarray(_np_load(wdir, "q_norm")),
        k_norm=jnp.asarray(_np_load(wdir, "k_norm")),
        wqkv=_fuse_out(
            _load_qt_T(wdir, "wq", in_major, config.weight_bits),
            _load_qt_T(wdir, "wk", in_major, config.weight_bits),
            _load_qt_T(wdir, "wv", in_major, config.weight_bits),
        ),
        wo=_load_qt_T(wdir, "wo", in_major, config.weight_bits),
        w13=_fuse_out(
            _load_qt_T(wdir, "w1", in_major, config.weight_bits),
            _load_qt_T(wdir, "w3", in_major, config.weight_bits),
        ),
        w2=_load_qt_T(wdir, "w2", in_major, config.weight_bits),
    )
    if config.shared_classifier:
        lm_head = _classifier_from(_np_load(wdir, "embed.q"), _np_load(wdir, "embed.s"))
    else:
        lm_head = _classifier_from(_np_load(wdir, "lm_head.q"), _np_load(wdir, "lm_head.s"))
    weights = Qwen3Weights(
        embed=embed,
        layers=layers,
        rms_final=jnp.asarray(_np_load(wdir, "rms_final")),
        lm_head=lm_head,
    )
    return config, weights


# --------------------------------------------------------------------- legacy
class _Cursor:
    """Sequential zero-copy cursor over a memory-mapped legacy checkpoint —
    counterpart of MemoryMapper (qwen3-inference/src/utils.rs:7-59)."""

    def __init__(self, path: str | Path):
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        self._buf = memoryview(self._mm)
        self.offset = 0

    def take(self, count: int, dtype) -> np.ndarray:
        nbytes = count * np.dtype(dtype).itemsize
        if self.offset + nbytes > len(self._buf):
            raise ValueError(
                f"Offset {self.offset} + size {nbytes} exceeds checkpoint size {len(self._buf)}"
            )
        arr = np.frombuffer(self._buf, dtype=dtype, count=count, offset=self.offset)
        self.offset += nbytes
        return arr

    def skip(self, nbytes: int):
        self.offset += nbytes

    def close(self):
        self._buf.release()
        self._mm.close()
        self._file.close()


def _read_legacy_qt(cur: _Cursor, n_tensors: int, rows: int, cols: int, group_size: int):
    """Read n_tensors consecutive (q, s) records (models/mod.rs:83-110) and
    stack to ([n, rows, cols] i8, [n, rows, cols/g] f32)."""
    qs, ss = [], []
    for _ in range(n_tensors):
        q = cur.take(rows * cols, np.int8).reshape(rows, cols)
        s = cur.take(rows * cols // group_size, np.float32).reshape(rows, cols // group_size)
        qs.append(q)
        ss.append(s)
    return np.stack(qs), np.stack(ss)


def load_legacy(path: str | Path) -> tuple[ModelConfig, Qwen3Weights]:
    """Load a reference-format .bin checkpoint
    (read order: models/qwen3.rs:199-277)."""
    config = read_config(path)
    cur = _Cursor(path)
    try:
        cur.skip(HEADER_SIZE)
        l, d, hd = config.n_layers, config.dim, config.head_dim
        ah, kv, h, v = config.all_heads_dim, config.kv_dim, config.hidden_dim, config.vocab_size
        g = config.group_size

        rms_att = cur.take(l * d, np.float32).reshape(l, d).copy()
        rms_ffn = cur.take(l * d, np.float32).reshape(l, d).copy()
        rms_final = cur.take(d, np.float32).copy()
        q_norm = cur.take(l * hd, np.float32).reshape(l, hd).copy()
        k_norm = cur.take(l * hd, np.float32).reshape(l, hd).copy()

        emb_q, emb_s = _read_legacy_qt(cur, 1, v, d, g)
        wq = _read_legacy_qt(cur, l, ah, d, g)
        wk = _read_legacy_qt(cur, l, kv, d, g)
        wv = _read_legacy_qt(cur, l, kv, d, g)
        wo = _read_legacy_qt(cur, l, d, ah, g)
        w1 = _read_legacy_qt(cur, l, h, d, g)
        w2 = _read_legacy_qt(cur, l, d, h, g)
        w3 = _read_legacy_qt(cur, l, h, d, g)
        if config.shared_classifier:
            cls_q, cls_s = emb_q, emb_s
        else:
            cls_q, cls_s = _read_legacy_qt(cur, 1, v, d, g)

        embed = QuantizedTensor(jnp.asarray(emb_q[0]), jnp.asarray(emb_s[0]))
        lm_head = _classifier_from(cls_q[0], cls_s[0])

        def qt_T(pair):
            q, s = _transpose_qt(pair[0], pair[1])
            return QuantizedTensor(
                jnp.asarray(np.ascontiguousarray(q)), jnp.asarray(np.ascontiguousarray(s))
            )

        layers = Qwen3LayerWeights(
            rms_att=jnp.asarray(rms_att),
            rms_ffn=jnp.asarray(rms_ffn),
            q_norm=jnp.asarray(q_norm),
            k_norm=jnp.asarray(k_norm),
            wqkv=_fuse_out(qt_T(wq), qt_T(wk), qt_T(wv)),
            wo=qt_T(wo),
            w13=_fuse_out(qt_T(w1), qt_T(w3)),
            w2=qt_T(w2),
        )
        return config, Qwen3Weights(
            embed=embed, layers=layers, rms_final=jnp.asarray(rms_final), lm_head=lm_head
        )
    finally:
        cur.close()


def load_checkpoint(path: str | Path) -> tuple[ModelConfig, Qwen3Weights]:
    """Load either checkpoint flavor (directory → native, file → legacy)."""
    path = Path(path)
    if path.is_dir():
        return load_native(path)
    return load_legacy(path)
