"""AOT cold-start benchmark (VERDICT r3 #9).

The flagship train step's first compile costs 60-130 s on a fresh machine
(the persistent JAX compilation cache amortizes it per-machine only). Two
AOT mechanisms are measured here:

  * `jax.experimental.serialize_executable`: pickles the COMPILED PJRT
    executable — a fresh process on the same chip type pays deserialize +
    execute only (no trace, no XLA compile). This is the real cold-start
    fix for fleet deployment: build once, ship the executable.
  * `jax.export`: serializes StableHLO — portable across jax versions and
    machines, but the importer still pays the XLA compile (it removes the
    TRACE cost only). Measured for completeness.

Phases (run this script twice):
  --phase build    compile the flagship fused train step, save both
                   artifacts + timing to results/aot_artifacts/
  --phase load     in a FRESH process with a COLD compilation cache
                   (JAX_COMPILATION_CACHE_DIR pointed at an empty dir),
                   load each artifact and time the first step.

Writes/updates results/aot_coldstart.json.
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ART = REPO / "results" / "aot_artifacts"
OUT = REPO / "results" / "aot_coldstart.json"

B, T, SUB = 8192, 61, 4


def _force_host(tree):
    """Materialise one leaf on the host — the axon remote-execution layer's
    block_until_ready returns early on queued work (CLAUDE.md), so a
    device->host transfer is the only honest completion barrier."""
    import jax
    import numpy as np

    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


def _inputs():
    import jax
    import jax.numpy as jnp

    import hybrid_ode_tpu as ht

    config = ht.HybridConfig(solver="rk4")
    params = ht.init_hybrid_params(jax.random.PRNGKey(0), config)
    base = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    y0 = jnp.abs(base[None, :] * (1.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (B, 6))))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 5.0, T), (B, T))
    meal = jnp.broadcast_to(jnp.zeros(T).at[12].set(2.0), (B, T))
    tvns = jnp.zeros((B, T))
    tgt = y0[:, None, :] * jnp.ones((1, T, 1))
    return params, y0, ts, meal, tvns, tgt


def _train_step():
    import jax
    import jax.numpy as jnp

    from hybrid_ode_tpu.ops.pallas_rk4 import fused_rk4_hybrid

    params, y0, ts, meal, tvns, tgt = _inputs()

    def loss(p, y):
        pred = fused_rk4_hybrid(y, ts, meal, tvns, p["ode"], p["nn"],
                                substeps=SUB)
        return jnp.sum((pred - tgt) ** 2)

    step = jax.jit(jax.grad(loss))
    return step, params, y0


def build():
    import jax

    # compile WITHOUT the persistent cache so the build time is honest
    step, params, y0 = _train_step()
    t0 = time.time()
    lowered = step.lower(params, y0)
    trace_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    t0 = time.time()
    g = compiled(params, y0)
    _force_host(g)  # axon block_until_ready returns early on queued work
    first_exec_s = time.time() - t0

    ART.mkdir(parents=True, exist_ok=True)
    from jax.experimental import serialize_executable as se

    t0 = time.time()
    payload = se.serialize(compiled)
    ser_s = time.time() - t0
    (ART / "train_step_executable.pkl").write_bytes(pickle.dumps(payload))

    exp_err = None
    try:
        from jax import export as jexport

        t0 = time.time()
        exp = jexport.export(step)(params, y0)
        blob = exp.serialize()
        export_s = time.time() - t0
        (ART / "train_step_stablehlo.bin").write_bytes(blob)
    except Exception as e:  # Pallas custom calls may refuse export
        exp_err = f"{type(e).__name__}: {str(e)[:300]}"
        export_s = None

    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    results["build"] = {
        "trace_lower_s": round(trace_s, 2),
        "xla_compile_s": round(compile_s, 2),
        "first_exec_s": round(first_exec_s, 3),
        "serialize_executable_s": round(ser_s, 2),
        "executable_bytes": (ART / "train_step_executable.pkl").stat().st_size,
        "jax_export_s": None if export_s is None else round(export_s, 2),
        "jax_export_error": exp_err,
        "shape": {"B": B, "T": T, "substeps": SUB},
    }
    OUT.parent.mkdir(exist_ok=True)
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps(results["build"], indent=1))


def load():
    import jax

    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    params, y0, *_ = _inputs()

    from jax.experimental import serialize_executable as se

    t0 = time.time()
    payload = pickle.loads((ART / "train_step_executable.pkl").read_bytes())
    compiled = se.deserialize_and_load(*payload) if isinstance(payload, tuple) \
        else se.deserialize_and_load(payload)
    deser_s = time.time() - t0
    t0 = time.time()
    g = compiled(params, y0)
    _force_host(g)
    first_s = time.time() - t0
    results["load_serialized_executable"] = {
        "deserialize_s": round(deser_s, 2),
        "first_step_s": round(first_s, 3),
    }

    blob_path = ART / "train_step_stablehlo.bin"
    if blob_path.exists():
        from jax import export as jexport

        t0 = time.time()
        exp = jexport.deserialize(blob_path.read_bytes())
        fn = jax.jit(exp.call)
        g = fn(params, y0)
        _force_host(g)
        results["load_jax_export"] = {
            "first_step_s_incl_xla_compile": round(time.time() - t0, 2)}

    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps({k: v for k, v in results.items() if k != "build"},
                     indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["build", "load"], required=True)
    args = ap.parse_args()
    (build if args.phase == "build" else load)()
