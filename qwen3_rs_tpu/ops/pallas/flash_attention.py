"""Flash-style GQA attention (Pallas).

Placeholder stage: currently delegates to the fused-XLA attention
(ops/attention.py), which already runs the score/softmax/value contraction
as MXU matmuls in one fusion region.  The blockwise online-softmax kernel
over the paged KV cache lands with the serving path (SURVEY §7 M3) and will
replace this delegate without changing call sites.
"""

from __future__ import annotations

import jax


def flash_gqa_attention(q, k, v, q_pos) -> jax.Array:
    from ..attention import gqa_attention_xla

    return gqa_attention_xla(q, k, v, q_pos)
