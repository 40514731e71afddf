"""Autotune the Pallas flash-attention kernel against XLA attention.

Micro-benchmarks masked attention at the 3DMatch coarse bench shape
([B=16, H=4, L=S=704]) over kernel tile configurations and output dtypes,
against the XLA einsum path the model defaults to (nn/transformer.py
logits_layout='blsh', bf16 inputs + f32 logits). The winner (if any)
becomes the TransformerConfig flash default for this TPU generation.

Measurement rules for the tunneled backend (ROADMAP "Performance map"):
each variant applies the attention REPEATEDLY inside one jit via lax.scan
(tunnel RTT ~27 ms/readback would otherwise swamp a ~1-4 ms attention),
and completion is forced with a device->host readback every timed call.

Run on the chip: python tools/tune_flash_attention.py [reps] [iters]
Prints a table + one JSON line with every variant's per-layer ms.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, L, S = 16, 4, 704, 704
DPAD = 128          # head-pad 128 (align_heads auto policy for 432/4)
SCALE = 1.0 / (108 ** 0.5)
if os.environ.get("DIFFREG_TUNE_SMALL"):    # CPU smoke (interpret mode)
    B, H, L, S = 2, 2, 128, 128


def _xla_attention(q, k, v, kv_mask, q_mask):
    """The model's default XLA path (nn/transformer.py:394-412, 'blsh',
    bf16 inputs -> f32 logits -> softmax -> bf16 AV), head-batched."""
    a = jnp.einsum("bhld,bhsd->bhls", q, k,
                   preferred_element_type=jnp.float32)
    bad = q_mask[:, None, :, None] & (~kv_mask[:, None, None, :])
    a = jnp.where(bad, -1e9, a)
    a = a * SCALE
    a = jax.nn.softmax(a, axis=-1)
    return jnp.einsum("bhls,bhsd->bhld", a.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from diffreg_tpu.ops.pallas.attention_kernel import masked_attention_pallas

    dev = jax.devices()[0]
    interpret = dev.platform == "cpu"
    print(f"device: {dev} interpret={interpret} reps={reps}", flush=True)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, DPAD), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, DPAD), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, DPAD), jnp.bfloat16)
    kv_mask = jnp.asarray(rng.rand(B, S) > 0.1)
    q_mask = jnp.asarray(rng.rand(B, L) > 0.1)

    def chain(attn_fn):
        """reps sequential attention applications inside ONE jit: feed the
        output back as q so XLA cannot hoist or parallelize the chain."""
        @jax.jit
        def run(q, k, v):
            def body(qc, _):
                o = attn_fn(qc, k, v)
                return o.astype(q.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=reps)
            return out
        return run

    def time_variant(name, attn_fn):
        run = chain(attn_fn)
        out = run(q, k, v)
        np.asarray(out)                       # compile + warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = run(q, k, v)
            np.asarray(out)                   # readback barrier
            times.append((time.perf_counter() - t0) / reps * 1e3)
        ms = float(np.min(times))             # best-of to shed tunnel jitter
        print(f"{name:34s} {ms:7.3f} ms/layer", flush=True)
        return ms

    results = {}
    results["xla_blsh_bf16"] = time_variant(
        "XLA blsh (model default)",
        lambda qc, k, v: _xla_attention(qc, k, v, kv_mask, q_mask))

    tile_grid = [(128, 128), (128, 256), (256, 128), (256, 256),
                 (128, 768), (256, 768), (704, 768)]
    for q_tile, kv_tile in tile_grid:
        for out_bf16 in (False, True):
            name = f"pallas q{q_tile} kv{kv_tile}{' bf16out' if out_bf16 else ''}"
            fn = functools.partial(
                masked_attention_pallas, kv_mask=kv_mask, q_tile=q_tile,
                kv_tile=kv_tile, interpret=interpret, scale=SCALE,
                out_dtype=jnp.bfloat16 if out_bf16 else None)
            try:
                key = f"pallas_q{q_tile}_kv{kv_tile}" + ("_bf16o" if out_bf16 else "")
                results[key] = time_variant(
                    name, lambda qc, k, v, fn=fn: fn(qc, k, v))
            except Exception as e:  # Mosaic rejects some tile combos
                print(f"{name:34s} FAILED: {type(e).__name__}", flush=True)

    best = min((v, k) for k, v in results.items())
    print(json.dumps({"metric": "attention_ms_per_layer",
                      "shape": [B, H, L, S, DPAD],
                      "best": {"variant": best[1], "ms": round(best[0], 3)},
                      "xla_ms": round(results["xla_blsh_bf16"], 3),
                      "results": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
