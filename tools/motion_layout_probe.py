"""Probe: relayout copies around the temporal-attention Pallas kernel.

The round-2 bench trace shows ~0.17 s/clip of zero-FLOP copies in the
bf16[2,16,1024,320] shape bucket — relayouts between the motion-module
token stream ([32,1024,320], XLA prefers pixels-minor {1,2,0}) and the
kernel's default-layout operands. Hypothesis: computing to_q/k/v (and
to_out) on the 4D [2,16,1024,320] view lets XLA fold the relayout into
the matmuls (some q/k/v fusions already emit the 4D layout at 122 TF/s)
instead of issuing separate copies.

Times a scanned mini motion-module (LN -> to_q/k/v -> kernel -> to_out
-> residual) at the stage-5 32x32 shape in both formulations and counts
`copy` HLO ops. TPU only; serialize with other tunnel jobs.
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from neurons_tpu.utils import compile_cache
compile_cache.setup("tpu")
jax.config.update("jax_default_matmul_precision", "bfloat16")
import jax.numpy as jnp

from neurons_tpu.ops.temporal_attention import temporal_attention

B, F, D, C = 2, 16, 1024, 320
H = 8
STEPS = 200


def ln(x, g, b):
    m = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * g + b


def module_flat(tokens, p):
    """Current formulation: everything on [(B F), D, C]."""
    t = ln(tokens, p["g"], p["b"])
    q = t @ p["wq"]
    k = t @ p["wk"]
    v = t @ p["wv"]
    out = temporal_attention(q, k, v, F, H, (C // H) ** -0.5)
    return tokens + out @ p["wo"]


def module_4d(tokens, p):
    """4D formulation: LN/projections on [B, F, D, C]; kernel sees the
    flattened view (bitcast)."""
    t4 = tokens.reshape(B, F, D, C)
    t = ln(t4, p["g"], p["b"])
    q = (t @ p["wq"]).reshape(B * F, D, C)
    k = (t @ p["wk"]).reshape(B * F, D, C)
    v = (t @ p["wv"]).reshape(B * F, D, C)
    out = temporal_attention(q, k, v, F, H, (C // H) ** -0.5)
    out4 = out.reshape(B, F, D, C) @ p["wo"]
    return tokens + out4.reshape(B * F, D, C)


def run(name, body, x, p):
    def scanned(x, p):
        return jax.lax.scan(lambda c, _: (body(c, p), None), x,
                            None, length=STEPS)[0]
    jitted = jax.jit(scanned)
    compiled = jitted.lower(x, p).compile()
    hlo = compiled.as_text()
    ncopy = len(re.findall(r"= bf16\[(?:2,16|32),1024,320\][^\n]*copy\(",
                           hlo))
    out = jitted(x, p)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jitted(x, p)
        _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 3 / STEPS * 1e3
    print(f"{name:18s} {dt:7.3f} ms/module   token-stream copies in HLO: "
          f"{ncopy}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    p = {
        "g": jnp.ones((C,), jnp.bfloat16), "b": jnp.zeros((C,), jnp.bfloat16),
        "wq": jax.random.normal(ks[0], (C, C), jnp.bfloat16) * 0.05,
        "wk": jax.random.normal(ks[1], (C, C), jnp.bfloat16) * 0.05,
        "wv": jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.05,
        "wo": jax.random.normal(ks[3], (C, C), jnp.bfloat16) * 0.05,
    }
    x = jax.random.normal(ks[4], (B * F, D, C), jnp.bfloat16)
    run("flat (current)", module_flat, x, p)
    run("4D projections", module_4d, x, p)


if __name__ == "__main__":
    main()
