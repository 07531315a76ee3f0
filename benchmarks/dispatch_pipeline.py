"""Un-chunked interactive step wall: blocking vs pipelined dispatch (VERDICT r4 #6).

Context. BENCH_r03 -> r04 showed `dispatch_overhead_ms` moving 25.9 -> 35.2 ms,
2x the 17.7 ms amortized train step. bench.py r5 already switched to reporting
the MIN RTT (the stable latency floor) alongside the mean (jitter visibility);
this benchmark answers the remaining question: what does an UN-chunked
interactive caller actually pay per step, and can host-loop pipelining
(async dispatch + donated device-resident params) push the steady-state
per-step wall under the axon tunnel's blocking round-trip?

Three regimes, identical B=8192 fused-kernel SGD train step
(grad through ops/pallas_rk4.fused_rk4_hybrid custom VJP + in-jit SGD update,
params donated so the carried state never leaves the device):

  1. rtt          — empty `x+1` program, 30 calls: pure tunnel transport.
  2. blocking     — one step per dispatch, block on the result each step:
                    what a naive interactive loop pays (>= rtt + compute).
  3. pipelined    — chain params_{i+1} = step(params_i, i) WITHOUT blocking;
                    block once at the end. JAX async dispatch lets the host
                    run ahead, so steady-state per-step wall = max(compute,
                    per-dispatch send cost), hiding the round-trip latency.

Inputs vary per call via a scalar seed folded into y0 INSIDE the jitted step
(axon dedupes identical program+input executions; a scalar defeats that
without shipping the 8192x6 batch over the WAN each step).

Writes results/dispatch_pipeline.json. Parity note: the reference has no
dispatch story at all (single-process blocking scipy at
/root/reference/models/hybrid_ode_nn.py:240); this measures a TPU-framework
property with no reference analogue, gated by VERDICT r4 item 6
(target: steady-state un-chunked step wall <= 25 ms at B=8192, or a
documented tunnel floor).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _tpu_reachable  # subprocess probe w/ hard timeout


def main():
    tpu_ok = _tpu_reachable()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    if not tpu_ok:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import hybrid_ode_tpu as ht

    if tpu_ok:
        from hybrid_ode_tpu.ops.pallas_rk4 import fused_rk4_hybrid

        N, T, SUB, K = 8192, 61, 4, 30
    else:
        from hybrid_ode_tpu.dynamics.controls import Controls

        N, T, SUB, K = 256, 61, 4, 5
        _cfg = ht.HybridConfig(solver="rk4", substeps=SUB, mode="scan")

        def fused_rk4_hybrid(y, ts, meal, tvns, ode, nn, substeps=SUB):
            ctrl = Controls(ts=ts, signals={"meal": meal, "tVNS": tvns})
            return ht.batched_forward({"ode": ode, "nn": nn}, y, ts, ctrl, _cfg)

    config = ht.HybridConfig(solver="rk4")
    params = ht.init_hybrid_params(jax.random.PRNGKey(0), config)
    params["nn"]["w4"] = 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), params["nn"]["w4"].shape)

    base = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    y0s = jnp.abs(base[None, :] * (1.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (N, 6))))
    ts1 = jnp.linspace(0.0, 5.0, T)
    meal1 = jnp.zeros((T,)).at[12].set(2.0).at[36].set(1.5)
    tsB = jnp.broadcast_to(ts1, (N, T))
    mealB = jnp.broadcast_to(meal1, (N, T))
    tvnsB = jnp.zeros((N, T))
    tgt = y0s[:, None, :] * jnp.ones((1, T, 1))

    def loss(p, y):
        pred = fused_rk4_hybrid(y, tsB, mealB, tvnsB, p["ode"], p["nn"],
                                substeps=SUB)
        return jnp.sum((pred - tgt) ** 2)

    LR = 1e-9  # keep the chained params numerically inert over K steps

    @jax.jit
    def rtt_probe(x):
        return x + 1.0

    # donate the carried params: the update happens in-place on device and
    # the host never touches the weights between steps
    def _step(p, seed):
        y = y0s * (1.0 + 1e-6 * seed)
        g = jax.grad(loss)(p, y)
        new = jax.tree_util.tree_map(lambda a, b: a - LR * b, p, g)
        return new, g["nn"]["w2"].sum()

    step = jax.jit(_step, donate_argnums=(0,))

    # ---- 1. tunnel RTT ----------------------------------------------------
    float(rtt_probe(jnp.float32(0)))
    rtts = []
    for i in range(30):
        t0 = time.time()
        float(rtt_probe(jnp.float32(i)))
        rtts.append(time.time() - t0)
    rtt_min = min(rtts) * 1e3
    rtt_mean = sum(rtts) / len(rtts) * 1e3

    # ---- compile + warm ----------------------------------------------------
    p = jax.tree_util.tree_map(jnp.asarray, params)
    t0 = time.time()
    p, s = step(p, jnp.float32(0))
    float(s)
    compile_s = time.time() - t0

    # ---- 2. blocking loop ---------------------------------------------------
    walls = []
    for i in range(K):
        t0 = time.time()
        p, s = step(p, jnp.float32(100 + i))
        float(s)  # block on the result every step
        walls.append(time.time() - t0)
    blocking_ms = sorted(walls)[len(walls) // 2] * 1e3  # median
    blocking_min_ms = min(walls) * 1e3

    # ---- 3. pipelined loop --------------------------------------------------
    # chain donated params without blocking; the host queues K dispatches and
    # blocks once at the end — steady-state wall/step is what an un-chunked
    # production loop actually pays
    p, s = step(p, jnp.float32(1000))
    float(s)  # drain the queue so t0 starts clean
    t0 = time.time()
    outs = []
    for i in range(K):
        p, s = step(p, jnp.float32(2000 + i))
        outs.append(s)
    float(outs[-1])
    jax.block_until_ready(p)
    pipelined_ms = (time.time() - t0) / K * 1e3

    target_met = bool(pipelined_ms <= 25.0)
    result = {
        "batch": N,
        "k_steps": K,
        "rtt_ms_min": round(rtt_min, 1),
        "rtt_ms_mean": round(rtt_mean, 1),
        "rtt_ms_all": [round(r * 1e3, 1) for r in rtts],
        "compile_or_first_step_s": round(compile_s, 1),
        "blocking_step_ms_median": round(blocking_ms, 1),
        "blocking_step_ms_min": round(blocking_min_ms, 1),
        "pipelined_step_ms": round(pipelined_ms, 1),
        "target_unchunked_le_ms": 25.0,
        "target_met": target_met,
        "device": str(jax.devices()[0].device_kind),
        "platform": jax.devices()[0].platform,
        "tpu": tpu_ok,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "dispatch_pipeline.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
