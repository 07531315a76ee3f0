"""Hybrid mechanistic-ODE + NN-residual model: dx/dt = f_physio + g_NN.

Functional redesign of the reference `models/hybrid_ode_nn.py:22-438`.
Parameters are a nested pytree {'ode': {...}, 'nn': {...}} passed explicitly,
so the reference's parameter-swapping machinery (`forward_with_params`,
60 lines of buffer save/restore at `models/hybrid_ode_nn.py:381-438`) reduces
to a dict merge, and VI/MCMC/Sobol all vmap over parameter axes for free.

Loss parity (reference `models/hybrid_ode_nn.py:263-351`):
    total = data_MSE + lambda1 * physics + lambda2 * reg
  * data: MSE of trajectory vs observations, optionally masked for irregular
    sampling (the reference's modification_report.md:60-64 intent — mask,
    don't interpolate — which the reference code never implemented).
  * physics: RHS-consistency at <=20 sampled time points. DELIBERATE
    DEVIATION: the reference re-solves a 0.1 h mini-trajectory per sampled
    point and finite-differences it (`hybrid_ode_nn.py:320-330`) — 20 extra
    ODE solves per batch whose FD target is just a smeared RHS evaluation.
    We use the manuscript's definition (model-predicted derivatives,
    manuscript.tex:545): finite differences of the *predicted trajectory*
    between adjacent observation times vs the hybrid RHS — no re-solve,
    fully differentiable, vectorised over points and batch.
  * reg: NN weight L2 (note the reference applies lambda2 twice — once inside
    `regularization_loss(l2_weight=lambda2)` and once as the outer multiplier
    `hybrid_ode_nn.py:342-345`; we reproduce lambda2^2 * sum(w^2) for parity).
    With variational training the reg term is the negative ELBO handled by
    `inference.vi`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from hybrid_ode_tpu.dynamics.controls import Controls, eval_controls
from hybrid_ode_tpu.dynamics.ode_core import make_ode_params, mechanistic_field
from hybrid_ode_tpu.dynamics.residual import init_mlp_params, mlp_apply, mlp_l2, residual_apply
from hybrid_ode_tpu.solvers.api import odeint

STATE_NAMES = ("Glucose", "Insulin", "Glucagon", "GLP1", "GE", "FFA")


@dataclasses.dataclass(frozen=True)
class HybridConfig:
    """Static model/solver configuration (hashable: safe as a jit static arg)."""

    nn_hidden: int = 64
    nn_layers: int = 4
    activation: str = "relu"
    use_nn: bool = True
    # NN-only ablation: zero the mechanistic drift so dynamics are purely the
    # learned residual (completes the manuscript's ablation grid — the
    # reference has no such switch; its table only covers mech-only/no-Bayes).
    use_mech: bool = True
    solver: str = "dopri5"
    rtol: float = 1e-6
    atol: float = 1e-8
    mode: str = "scan"
    max_steps_per_interval: int = 8
    substeps: int = 4
    adjoint: str = "discrete"
    n_states: int = 6
    n_physics_points: int = 20
    # multiple shooting: split each window into `shooting_segments` pieces,
    # each integrated from the OBSERVED state at its left edge. Densifies the
    # gradient signal and avoids long-horizon blow-up — a capability the
    # reference lacks (it always integrates the full window from t0).
    # 1 = single shooting (reference-parity default).
    shooting_segments: int = 1
    # subject conditioning: encode the first `context_points` observations of
    # each window into a latent subject code — amortized subject
    # identification attacking the population-heterogeneity error floor (no
    # reference analogue). 0 = off. Two modes:
    #   'features': `context_dim` latent appended to the NN-residual input
    #   'params':   per-subject multipliers e^delta on the mechanistic
    #               parameters named in `context_params` — matches the 4GI
    #               generator's actual heterogeneity (per-subject BASELINE
    #               multipliers, data/fourgi_gen.py:78-83)
    context_points: int = 0
    context_dim: int = 8
    context_mode: str = "features"
    context_params: tuple = ("G_b", "I_b", "Glu_b")
    # exogenous-insulin routing of the 'tVNS' control channel (which carries
    # the IV insulin rate for ICU cohorts, data/mimic.py:394):
    #   'nn'   — reference parity: the rate is an NN input feature only.
    #            MEASURED to be causally confounded under the closed-loop
    #            sliding-scale protocol (RESULTS.md intervention study:
    #            predicted dose effects anti-correlate with truth, r ~ -0.78).
    #   'mech' — causal routing: the rate enters the mechanistic insulin
    #            compartment via the learnable gain k_ex and the NN is
    #            BLINDED to it (sees a zero tVNS feature), so the model
    #            cannot learn the protocol's insulin<->high-glucose
    #            association; counterfactual dose response flows through
    #            insulin-state physiology the NN observes causally.
    #   'both' — mechanistic routing + NN still sees the raw rate.
    #   'mech_blind' — full causal masking (round 5). 'mech' is not enough
    #            on cohorts where insulin is mostly exogenous (the
    #            dysglycemic ICU subpopulation): the NN still sees the
    #            insulin STATE, which under a sliding scale is a proxy for
    #            "glucose was just high", and the learned glucose response
    #            to insulin comes out POSITIVE (measured: open-loop probe,
    #            RESULTS.md round-5 dosing study). Here the NN is blinded
    #            to the insulin state too, and the mechanistic
    #            insulin->glucose coupling becomes the trainable
    #            sign-definite S_I (|.|-constrained, dynamics/ode_core.py)
    #            so the interventional pathway is monotone by construction
    #            and its magnitude is identified from randomized protocol
    #            variation.
    exog_insulin: str = "nn"
    # fused Pallas trajectory kernel (forward + custom-VJP backward) for the
    # rk4 solver: the whole integration (and its reverse-time adjoint) runs
    # in VMEM — see ops/pallas_rk4.py. Requires solver='rk4', relu, no
    # 'norm' group, and only meal/tVNS/context controls; batched_forward
    # raises otherwise. Auto-falls back to interpret mode off-TPU.
    use_pallas: bool = False


def config_from_dict(cfg: Mapping[str, Any], use_nn: Optional[bool] = None,
                     **overrides) -> "HybridConfig":
    """THE canonical config-dict -> HybridConfig constructor.

    Single source of truth consumed by train/loop, train/cli, evals/evaluate
    and plots/figures, so every CLI builds the exact model (incl. context /
    multiple-shooting fields) a checkpoint was trained with.
    """
    m = cfg.get("model", {})
    abl = cfg.get("ablation", {})
    kw = dict(
        nn_hidden=m.get("nn_hidden", 64),
        nn_layers=m.get("nn_layers", 4),
        activation=m.get("activation", "relu"),
        use_nn=(not abl.get("no_nn", False)) if use_nn is None else use_nn,
        use_mech=not abl.get("no_mech", False),
        solver=m.get("solver", "dopri5"),
        rtol=m.get("rtol", 1e-6),
        atol=m.get("atol", 1e-8),
        mode=m.get("mode", "scan"),
        max_steps_per_interval=m.get("max_steps_per_interval", 8),
        substeps=m.get("substeps", 4),
        adjoint=m.get("adjoint", "discrete"),
        n_physics_points=m.get("n_physics_points", 20),
        shooting_segments=m.get("shooting_segments", 1),
        context_points=m.get("context_points", 0),
        context_dim=m.get("context_dim", 8),
        context_mode=m.get("context_mode", "features"),
        context_params=tuple(m.get("context_params", ("G_b", "I_b", "Glu_b"))),
        exog_insulin=m.get("exog_insulin", "nn"),
        use_pallas=m.get("use_pallas", False),
    )
    kw.update(overrides)
    return HybridConfig(**kw)


def init_hybrid_params(
    key: jax.Array,
    config: HybridConfig = HybridConfig(),
    ode_params: Optional[Mapping[str, float]] = None,
    dtype=jnp.float32,
    norm_stats: Optional[Tuple] = None,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Initialise {'ode': 17 scalars, 'nn': zero-output MLP} parameter pytree.

    norm_stats: optional (mean (6,), std (6,)) of the z-scoring applied to the
    data. When given, the mechanistic core is evaluated in PHYSICAL units
    inside the z-scored solve (see `hybrid_field`) — fixing the reference's
    conceptual bug of feeding z-scored states into physiological equations
    (its "mechanistic" core is dimensionally meaningless during training).
    """
    key, enc_key = jax.random.split(key)
    feat_ctx = (config.context_dim
                if config.context_points > 0 and config.context_mode == "features"
                else 0)
    nn = init_mlp_params(
        key,
        input_dim=3 + config.n_states + feat_ctx,
        hidden_dim=config.nn_hidden,
        output_dim=config.n_states,
        n_layers=config.nn_layers,
        dtype=dtype,
    )
    params = {"ode": make_ode_params(ode_params, dtype=dtype), "nn": nn}
    if config.exog_insulin != "nn" and "k_ex" not in params["ode"]:
        # learnable exogenous-insulin gain (units: insulin-state change per
        # unit of the O(1) rate signal); identified from the observed insulin
        # channel. Init 1.0: positive causal prior, data sets the scale.
        params["ode"]["k_ex"] = jnp.asarray(1.0, dtype)
    if config.exog_insulin == "mech_blind" and "S_I" not in params["ode"]:
        # trainable sign-definite insulin sensitivity (|S_I| in the glucose
        # balance, ode_core.py): with the NN blinded to the insulin state,
        # this is the ONLY insulin->glucose pathway, so its magnitude is
        # the model's interventional dose response. Init at the reference's
        # fixed coupling (0.01).
        params["ode"]["S_I"] = jnp.asarray(0.01, dtype)
    if config.context_points > 0:
        # context encoder: flattened first-k observations (+ their times,
        # relative to window start) -> latent subject code
        out_dim = (config.context_dim if config.context_mode == "features"
                   else len(config.context_params))
        params["enc"] = init_mlp_params(
            enc_key,
            input_dim=config.context_points * (config.n_states + 1),
            hidden_dim=32,
            output_dim=out_dim,
            n_layers=2,
            dtype=dtype,
        )
        if config.context_mode == "features":
            # non-zero output init: the context is a feature, not a residual
            params["enc"]["w2"] = 0.1 * jax.random.normal(
                jax.random.fold_in(enc_key, 1), params["enc"]["w2"].shape, dtype
            )
        # params mode keeps the zero output init: e^0 = 1 (population start)
    if norm_stats is not None:
        mean = jnp.asarray(norm_stats[0], dtype)
        std = jnp.asarray(norm_stats[1], dtype)
        # Uninformative (near-constant) states — the placeholder GE/FFA
        # columns — have std ~ 1e-6; a raw 1/std would amplify their
        # mechanistic drift by ~1e6 and blow up the solve. Clamp their
        # transform to identity scale (z ~ 0 maps to the constant mean).
        informative = std > (1e-4 * jnp.abs(mean) + 1e-6)
        params["norm"] = {
            "mean": mean,
            "std": jnp.where(informative, std, jnp.ones_like(std)),
        }
    return params


def hybrid_field(
    t: jnp.ndarray,
    y: jnp.ndarray,
    params: Mapping[str, Any],
    controls: Optional[Controls],
    config: HybridConfig,
) -> jnp.ndarray:
    """dx/dt = f_physio(t, x; theta) + g_NN(t, x, GLP1, tVNS; phi).

    With params['norm'] present (physical-core mode), y is z-scored but the
    mechanistic field is evaluated on de-normalised states and its derivative
    mapped back: dz/dt = f_mech(t, z*std + mean) / std. The NN residual keeps
    seeing the well-conditioned z-scored features.
    """
    context = None
    if controls is not None and "context" in controls.signals:
        context = controls.signals["context"]  # (context_dim,) per sample
        controls = Controls(
            ts=controls.ts,
            signals={k: v for k, v in controls.signals.items() if k != "context"},
        )
    inputs = eval_controls(controls, t)
    if config.exog_insulin != "nn" and "tVNS" in inputs:
        # causal routing: the tVNS channel (IV insulin rate on ICU cohorts)
        # becomes the mechanistic exogenous-insulin input (see HybridConfig)
        inputs = dict(inputs, I_ex=inputs["tVNS"])
    ode_p = params["ode"]
    if config.context_points > 0 and config.context_mode == "params":
        # subject-conditioned mechanistic parameters: p_i <- p_i * e^{delta_i}
        # (zero encoder output = population values; multiplicative, so sign
        # and scale of the Table-I physiology are preserved)
        delta = (context if context is not None
                 else jnp.zeros((len(config.context_params),), y.dtype))
        ode_p = dict(ode_p)
        for i, name in enumerate(config.context_params):
            ode_p[name] = ode_p[name] * jnp.exp(delta[..., i])
        context = None  # consumed; the NN residual sees no extra features
    if not config.use_mech:
        dy = jnp.zeros_like(y)
    elif "norm" in params:
        mean, std = params["norm"]["mean"], params["norm"]["std"]
        dy = mechanistic_field(t, y * std + mean, ode_p, inputs) / std
    else:
        dy = mechanistic_field(t, y, ode_p, inputs)
    if config.use_nn:
        # Parity: reference feeds the GLP1 *state* as the external-GLP1
        # feature and tVNS from the inputs (`models/hybrid_ode_nn.py:125-129`).
        glp1 = y[..., 3]
        tvns = inputs.get("tVNS", jnp.zeros_like(glp1))
        y_nn = y
        if config.exog_insulin in ("mech", "mech_blind"):
            # NN blinded to the raw rate — counterfactual response must flow
            # through the (observed, causal) insulin state
            tvns = jnp.zeros_like(glp1)
        if config.exog_insulin == "mech_blind":
            # ...and to the insulin STATE itself: under a closed-loop
            # protocol that state is a confounder proxy (see HybridConfig);
            # the response is carried by the sign-definite mechanistic S_I
            y_nn = y.at[..., 1].set(0.0)
        if (config.context_points > 0 and config.context_mode == "features"
                and context is None):
            # unconditioned call sites: neutral (zero) context
            context = jnp.zeros((config.context_dim,), y.dtype)
        dy_nn = residual_apply(
            params["nn"], t, y_nn, glp1, tvns, config.activation, extra=context
        )
        if config.exog_insulin == "mech_blind":
            # the NN must not write the insulin DERIVATIVE either: under a
            # sliding scale the dosing signal is reconstructible from the
            # glucose features the NN legitimately sees, so an insulin-
            # channel residual absorbs the exogenous appearance and k_ex
            # collapses toward 0 (measured: k_ex -> 0.076 with only the
            # input masked, RESULTS.md round-5 dosing study). Insulin
            # dynamics are purely mechanistic here; fitting the observed
            # insulin channel then identifies k_ex directly.
            dy_nn = dy_nn.at[..., 1].set(0.0)
        dy = dy + dy_nn
    return dy


def forward(
    params: Mapping[str, Any],
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    controls: Optional[Controls] = None,
    config: HybridConfig = HybridConfig(),
    **solver_overrides,
) -> jnp.ndarray:
    """Solve one trajectory: (n,) x (T,) -> (T, n). Batch with vmap
    (`batched_forward`) — the reference's serial per-sample Python loop
    (`models/hybrid_ode_nn.py:184`) has no analogue here."""

    def field(t, y, args):
        p, c = args
        return hybrid_field(t, y, p, c, config)

    kw = dict(
        solver=config.solver,
        rtol=config.rtol,
        atol=config.atol,
        mode=config.mode,
        max_steps_per_interval=config.max_steps_per_interval,
        substeps=config.substeps,
        adjoint=config.adjoint,
    )
    kw.update(solver_overrides)
    if kw["mode"] == "sync":
        # batch synchronization is meaningless for one trajectory; B=1 scan
        # is the identical per-sample semantics (batched_forward intercepts
        # mode='sync' BEFORE vmapping, so this branch serves direct
        # single-trajectory callers only)
        kw["mode"] = "scan"
    return odeint(field, y0, ts, (params, controls), **kw)


def _has_step_stats(config: HybridConfig) -> bool:
    return config.solver not in ("rk4", "euler") and config.adjoint != "backsolve"


def batched_forward(
    params: Mapping[str, Any],
    y0: jnp.ndarray,          # (B, n)
    ts: jnp.ndarray,          # (B, T) or (T,)
    controls: Optional[Controls] = None,  # signals (B, T), ts (B, T) — or None
    config: HybridConfig = HybridConfig(),
    **solver_overrides,
) -> jnp.ndarray:
    """Batch of trajectories in one vmap: (B, n) -> (B, T, n).

    With config.use_pallas (solver='rk4'), routes through the fused Pallas
    trajectory kernel instead — one kernel launch integrates the whole batch
    in VMEM, with a custom-VJP reverse-time adjoint kernel for training
    (ops/pallas_rk4.py). Identical semantics to the vmap path (tested)."""
    if ts.ndim == 1:
        ts = jnp.broadcast_to(ts[None, :], (y0.shape[0], ts.shape[0]))
    if config.use_pallas and not solver_overrides:
        return _pallas_forward(params, y0, ts, controls, config)
    ctrl_axes = None if controls is None else Controls(
        ts=0, signals={k: 0 for k in controls.signals}
    )
    mode = solver_overrides.get("mode", config.mode)
    if mode == "sync":
        # batch-SYNCHRONIZED adaptive stepping: one shared controller for
        # the whole batch (accept on the batch-max error norm), two-pass
        # gradients on the accepted mesh — no per-sample lockstep waste
        # (solvers/sync.py; measured vs mode='scan' in
        # results/adaptive_bound.json round 5)
        from hybrid_ode_tpu.solvers.sync import odeint_erk_sync
        from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

        if config.solver not in TABLEAUS:
            raise ValueError(
                f"mode='sync' supports the explicit adaptive solvers "
                f"{sorted(TABLEAUS)}, got {config.solver!r}")

        def field(t, y, args):
            p, c = args
            return hybrid_field(t, y, p, c, config)

        # span='auto' free-runs dopri5 across output points with CONTD5
        # dense output (scipy t_eval parity) — the time-gridded control
        # signals are passed so kinks (boluses, stepwise rates) become
        # forced step boundaries (solvers/sync.py _control_kink_stops)
        time_signals = None
        if controls is not None:
            time_signals = [v for v in controls.signals.values()
                            if hasattr(v, "ndim") and v.ndim >= 1
                            and v.shape[-1] == ts.shape[-1]]
        return odeint_erk_sync(
            field, y0, ts, (params, controls), TABLEAUS[config.solver],
            rtol=config.rtol, atol=config.atol,
            args_axes=(None, ctrl_axes),
            max_steps_per_interval=config.max_steps_per_interval,
            stop_signals=time_signals,
            return_stats=solver_overrides.get("return_stats", False),
        )
    fn = lambda y0_, ts_, c_: forward(params, y0_, ts_, c_, config, **solver_overrides)
    return jax.vmap(fn, in_axes=(0, 0, ctrl_axes))(y0, ts, controls)  # incl.
    # (preds, StepStats) pairs when return_stats=True rides solver_overrides


def _pallas_forward(
    params: Mapping[str, Any],
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    controls: Optional[Controls],
    config: HybridConfig,
) -> jnp.ndarray:
    """Dispatch to the fused Pallas RK4 kernel; validates supported semantics."""
    from hybrid_ode_tpu.ops.pallas_rk4 import fused_rk4_hybrid

    if config.solver != "rk4":
        raise ValueError(f"use_pallas requires solver='rk4', got {config.solver!r}")
    if config.activation != "relu":
        raise ValueError("use_pallas supports activation='relu' only")
    if "norm" in params:
        raise ValueError("use_pallas does not support the 'norm' physical-core mode")
    if not config.use_nn:
        raise ValueError("use_pallas requires use_nn=True (kernel fuses the MLP)")
    if not config.use_mech:
        raise ValueError("use_pallas requires use_mech=True (kernel fuses the mechanistic drift)")
    if config.exog_insulin != "nn":
        raise ValueError("use_pallas does not implement mechanistic "
                         "exogenous-insulin routing (exog_insulin="
                         f"{config.exog_insulin!r}); use the scan path")
    ctx_param_idx = ()
    if config.context_points > 0 and config.context_mode == "params":
        from hybrid_ode_tpu.ops.pallas_rk4 import PARAM_ORDER

        try:
            ctx_param_idx = tuple(PARAM_ORDER.index(n) for n in config.context_params)
        except ValueError as e:
            raise ValueError(
                f"use_pallas context_mode='params': every conditioned "
                f"parameter must be in the kernel's PARAM_ORDER ({e})"
            ) from None
    signals = dict(controls.signals) if controls is not None else {}
    context = signals.pop("context", None)
    if ctx_param_idx and context is None:
        raise ValueError(
            "context_mode='params' model called without a 'context' control "
            "signal — inject the subject codes first (with_context / "
            "identify_context); the kernel's per-sample parameter path "
            "cannot run unconditioned"
        )
    B, T = ts.shape
    meal = signals.pop("meal", None)
    tvns = signals.pop("tVNS", None)
    if signals:
        raise ValueError(f"use_pallas supports meal/tVNS/context controls only, got {sorted(signals)}")
    meal = jnp.zeros((B, T), y0.dtype) if meal is None else meal
    tvns = jnp.zeros((B, T), y0.dtype) if tvns is None else tvns
    interpret = jax.default_backend() != "tpu"
    return fused_rk4_hybrid(
        y0, ts, meal, tvns, params["ode"], params["nn"],
        substeps=config.substeps, n_layers=config.nn_layers,
        interpret=interpret, context=context, context_param_idx=ctx_param_idx,
    )


def encode_context(
    enc_params: Mapping[str, jnp.ndarray],
    observations: jnp.ndarray,   # (B, T, n)
    time_points: jnp.ndarray,    # (B, T)
    k: int,
    activation: str = "relu",
) -> jnp.ndarray:
    """Latent subject code from the first k observations of each window."""
    obs_k = observations[:, :k, :]
    t_rel = (time_points[:, :k] - time_points[:, :1])[..., None]
    feats = jnp.concatenate([obs_k, t_rel], axis=-1).reshape(obs_k.shape[0], -1)
    return mlp_apply(enc_params, feats, activation)


def with_context(
    params: Mapping[str, Any],
    batch: Mapping[str, Any],
    controls: Optional[Controls],
    config: HybridConfig,
) -> Optional[Controls]:
    """Inject the encoded subject context into the controls pytree."""
    if config.context_points <= 0 or "enc" not in params:
        return controls
    ctx = encode_context(
        params["enc"], batch["observations"], batch["time_points"],
        config.context_points, config.activation,
    )  # (B, context_dim)
    if controls is None:
        controls = Controls(ts=batch["time_points"], signals={})
    return Controls(ts=controls.ts, signals=dict(controls.signals, context=ctx))


def identify_context(
    params: Mapping[str, Any],
    batch: Mapping[str, Any],
    config: HybridConfig,
    *,
    steps: int = 100,
    lr: float = 0.02,
    prior_std: float = 0.2,
    points: Optional[int] = None,
    init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Test-time subject identification: refine each window's context code by
    gradient descent on the masked data loss over the first
    `config.context_points` observations, with the trained model FROZEN.

    `init` overrides the starting codes (B, context_dim) — e.g. an
    `amortize_encoder` output for SEMI-AMORTIZED identification: the
    amortized encoder pays one MLP pass, then a few refinement steps
    recover the per-window MAP quality (the per-window best-iterate
    guard below means the result never scores worse on the
    identification window than the supplied init).

    This is the MAP estimate of the per-subject latent given the
    identification window — initialization comes from the amortized encoder
    (when present), but the returned code no longer depends on how well
    that encoder happened to train: round-2 measured a 0.72/0.79/0.90
    fresh-cohort RMSE spread across seeds for `context_mode='params'`
    traced to encoder variance (RESULTS.md round-2 heterogeneity account;
    VERDICT r2 next-round #5). `prior_std` is a Gaussian TRUST REGION
    around the initialization: the penalty is ||ctx - ctx0||²/(2σ²), NOT
    a zero-centered prior — a trained encoder's operating point can sit
    at large codes (measured means ~±1.3 on the round-2 checkpoints, with
    the point-estimate ODE parameters co-adapted to them), and pulling
    toward zero destroys the model (measured 0.75 → 4.5 mmol/L).

    Robustness (learned on real fresh-cohort windows, round 3): the
    optimizer tracks the PER-WINDOW best iterate BY DATA LOSS — each
    window returns the code with the lowest masked data misfit it ever
    saw (the trust-region term only shapes the search), so a window whose
    refinement diverges (NaN trajectories from extreme deltas) or
    overfits keeps its encoder initialization instead of poisoning the
    batch.

    Returns the refined (B, context_dim) codes; inject them via
    `Controls(signals={'context': ctx, ...})` (what `with_context` does
    with the encoder output). Jit-compatible; one compiled program runs
    all `steps` Adam iterations (lax.scan).
    """
    import optax

    k = points if points is not None else config.context_points
    if k <= 0:
        raise ValueError("identify_context requires context_points > 0")
    # NOTE: `points` may exceed config.context_points — the ENCODER is fixed
    # to its trained input length, but the identification solve is not;
    # longer windows buy identifiability (basal multipliers are weakly
    # identified from 1 h of noisy data — measured horizon sweep in
    # results/subject_id.json).
    obs_k = jnp.asarray(batch["observations"])[:, :k]
    ts_k = jnp.asarray(batch["time_points"])[:, :k]
    mask = batch.get("mask")
    mask_k = (jnp.asarray(mask)[:, :k] if mask is not None
              else jnp.ones(ts_k.shape, obs_k.dtype))
    ext = batch.get("external_inputs") or {}
    sig_k = {n: jnp.asarray(v)[:, :k] for n, v in ext.items()}

    if init is not None:
        ctx0 = jnp.asarray(init)
    elif "enc" in params:
        # the encoder's input length is fixed at its TRAINED window even
        # when the identification solve uses a longer one
        ctx0 = encode_context(
            params["enc"], jnp.asarray(batch["observations"]),
            jnp.asarray(batch["time_points"]), config.context_points,
            config.activation,
        )
    else:
        dim = (len(config.context_params)
               if config.context_mode == "params" else config.context_dim)
        ctx0 = jnp.zeros((obs_k.shape[0], dim), obs_k.dtype)

    y0 = jnp.asarray(batch["initial_state"])
    denom = jnp.maximum(jnp.sum(mask_k, axis=1) * obs_k.shape[-1], 1.0)  # (B,)
    # the SAME per-state weighting as training (inverse-variance; zero for
    # uninformative placeholder channels like GE/FFA — without this the
    # deltas chase z-scored placeholder error and wreck the identification:
    # measured 0.98 -> 4.9 mmol/L before the fix)
    w_state = batch.get("loss_weights")
    w_state = (jnp.asarray(w_state) if w_state is not None
               else jnp.ones((obs_k.shape[-1],), obs_k.dtype))

    def data_vec(ctx):
        """Per-window masked data misfit (B,), NaN-safe."""
        ctrls = Controls(ts=ts_k, signals=dict(sig_k, context=ctx))
        preds = batched_forward(params, y0, ts_k, ctrls, config)
        se = ((preds - obs_k) ** 2) * w_state * mask_k[..., None]
        se = jnp.nan_to_num(se, nan=1e6, posinf=1e6)
        return jnp.sum(se, axis=(1, 2)) / denom

    def objective(ctx):
        trust = jnp.mean((ctx - ctx0) ** 2, axis=-1) / (2.0 * prior_std**2)
        d = data_vec(ctx)
        return jnp.sum(d + trust), d

    opt = optax.adam(lr)

    def one_step(carry, _):
        ctx, ostate, best_ctx, best_data = carry
        (_, dvec), g = jax.value_and_grad(objective, has_aux=True)(ctx)
        improved = dvec < best_data
        best_ctx = jnp.where(improved[:, None], ctx, best_ctx)
        best_data = jnp.where(improved, dvec, best_data)
        g = jnp.nan_to_num(g)
        upd, ostate = opt.update(g, ostate)
        ctx = optax.apply_updates(ctx, upd)
        return (ctx, ostate, best_ctx, best_data), None

    carry0 = (ctx0, opt.init(ctx0), ctx0, data_vec(ctx0))
    (ctx, _, best_ctx, best_data), _ = jax.lax.scan(
        one_step, carry0, None, length=steps
    )
    # final candidate
    dvec = data_vec(ctx)
    best_ctx = jnp.where((dvec < best_data)[:, None], ctx, best_ctx)
    return best_ctx


def forward_with_param_deltas(
    params: Mapping[str, Any],
    deltas: jnp.ndarray,            # (B, P) log-scale multipliers
    y0: jnp.ndarray,                # (B, n)
    ts: jnp.ndarray,                # (B, T)
    controls: Optional[Controls],
    config: HybridConfig,
) -> jnp.ndarray:
    """Batched rollout with PER-WINDOW mechanistic parameters: window b
    integrates with `ode[k] * exp(deltas[b, i])` for the i-th sorted ODE
    parameter name. This is the decode side of `identify_params`. (B, T, n).
    """
    names = sorted(params["ode"].keys())
    ctrl_axes = None if controls is None else Controls(
        ts=0, signals={k: 0 for k in controls.signals})

    def one(delta_w, y0_w, ts_w, c_w):
        ode = {k: params["ode"][k] * jnp.exp(delta_w[i])
               for i, k in enumerate(names)}
        return forward({**params, "ode": ode}, y0_w, ts_w, c_w, config)

    return jax.vmap(one, in_axes=(0, 0, 0, ctrl_axes))(deltas, y0, ts, controls)


def identify_params(
    params: Mapping[str, Any],
    batch: Mapping[str, Any],
    config: HybridConfig,
    *,
    context: Optional[jnp.ndarray] = None,
    steps: int = 150,
    lr: float = 0.02,
    prior_std: float = 0.1,
    points: Optional[int] = None,
) -> jnp.ndarray:
    """Test-time identification BEYOND the context code: refine per-window
    log-scale multipliers on ALL mechanistic parameters against the first
    `points` (noisy) observations, model frozen. Returns (B, P) deltas for
    the sorted `params['ode']` names; roll out with
    `forward_with_param_deltas`.

    Motivation (results/oracle_floor.json, round 5): the 3-basal 'params'
    context mode SATURATES at 0.481 mmol/L fresh-cohort RMSE even when
    identified on the full noiseless trajectory, while per-window
    refinement of all 17 mechanistic parameters reaches the 0.387 family
    floor — per-subject physiology varies in more than three basals
    (reference Table I, /root/reference/manuscript.tex:610-640). This is
    the deployable (noisy-window) counterpart of the oracle arm: the
    zero-centered log-scale trust region (`prior_std`, ||delta||^2/(2s^2))
    keeps 17 parameters from chasing observation noise in `points`
    samples, and the per-window best-iterate guard (same convention as
    `identify_context`) returns each window's lowest-data-misfit deltas.

    context: optional (B, ctx_dim) codes from `identify_context` — the
    param deltas then refine ON TOP of context conditioning (recommended:
    context first, deltas second; the two-stage order matches the
    semi-amortized estimator recipe).
    """
    import optax

    k = points if points is not None else max(config.context_points, 12)
    obs_k = jnp.asarray(batch["observations"])[:, :k]
    ts_k = jnp.asarray(batch["time_points"])[:, :k]
    mask = batch.get("mask")
    mask_k = (jnp.asarray(mask)[:, :k] if mask is not None
              else jnp.ones(ts_k.shape, obs_k.dtype))
    ext = batch.get("external_inputs") or {}
    sig_k = {n: jnp.asarray(v)[:, :k] for n, v in ext.items()}
    if context is not None:
        sig_k["context"] = jnp.asarray(context)
    y0 = jnp.asarray(batch["initial_state"])
    B = obs_k.shape[0]
    names = sorted(params["ode"].keys())
    P = len(names)
    denom = jnp.maximum(jnp.sum(mask_k, axis=1) * obs_k.shape[-1], 1.0)
    w_state = batch.get("loss_weights")
    w_state = (jnp.asarray(w_state) if w_state is not None
               else jnp.ones((obs_k.shape[-1],), obs_k.dtype))
    ctrls = Controls(ts=ts_k, signals=sig_k)

    def data_vec(deltas):
        preds = forward_with_param_deltas(params, deltas, y0, ts_k, ctrls,
                                          config)
        se = ((preds - obs_k) ** 2) * w_state * mask_k[..., None]
        se = jnp.nan_to_num(se, nan=1e6, posinf=1e6)
        return jnp.sum(se, axis=(1, 2)) / denom

    def objective(deltas):
        trust = jnp.mean(deltas**2, axis=-1) / (2.0 * prior_std**2)
        d = data_vec(deltas)
        return jnp.sum(d + trust), d

    opt = optax.adam(lr)

    def one_step(carry, _):
        deltas, ostate, best_d, best_data = carry
        (_, dvec), g = jax.value_and_grad(objective, has_aux=True)(deltas)
        improved = dvec < best_data
        best_d = jnp.where(improved[:, None], deltas, best_d)
        best_data = jnp.where(improved, dvec, best_data)
        g = jnp.nan_to_num(g)
        upd, ostate = opt.update(g, ostate)
        deltas = optax.apply_updates(deltas, upd)
        return (deltas, ostate, best_d, best_data), None

    d0 = jnp.zeros((B, P), obs_k.dtype)
    carry0 = (d0, opt.init(d0), d0, data_vec(d0))
    (deltas, _, best_d, best_data), _ = jax.lax.scan(
        one_step, carry0, None, length=steps)
    dvec = data_vec(deltas)
    return jnp.where((dvec < best_data)[:, None], deltas, best_d)


def amortize_encoder(
    params: Mapping[str, Any],
    batch: Mapping[str, Any],
    config: HybridConfig,
    *,
    points: Optional[int] = None,
    key: Optional[jax.Array] = None,
    id_steps: int = 150,
    id_lr: float = 0.02,
    prior_std: float = 0.3,
    hidden: int = 64,
    n_layers: int = 2,
    epochs: int = 3000,
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    val_frac: float = 0.15,
    targets: Optional[jnp.ndarray] = None,
    finetune_epochs: int = 400,
    finetune_lr: float = 3e-4,
    finetune_chunk: int = 50,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, float]]:
    """Distill `identify_context` into a feed-forward amortized encoder.

    Test-time identification (MAP refinement of the subject latent) closes
    the encoder-variance seed spread (results/subject_id.json) but costs
    `id_steps` Adam iterations of ODE solves per deployment window. This
    trains a NEW encoder — same featurization as `encode_context` but over
    a `points`-long window (typically the 3 h identification horizon, not
    the 1 h training context) — to regress the identified codes directly,
    so deployment pays ONE MLP forward pass instead of an inner
    optimization loop.

    The amortization cohort is `batch` (use a large simulated cohort — the
    4GI generator is vmapped and effectively free); targets are produced by
    `identify_context` with the model FROZEN unless supplied via `targets`.
    A `val_frac` split early-stops the regression on held-out code MSE
    (best-iterate, not last).

    Two stages. (1) Code regression toward the identified codes — fast
    (MLP-only) and a good initialization. (2) Decoder-aware FINE-TUNING
    (`finetune_epochs` > 0): the code-MSE objective is misaligned with
    deployment quality — round 3 measured the seed with the LOWEST
    held-out code MSE producing the WORST fresh-cohort forecast (its
    checkpoint's ODE solution is more sensitive to particular code
    directions, which isotropic code MSE cannot see). Stage 2 therefore
    trains the encoder THROUGH the frozen model on the full-window masked
    data loss: the encoder still reads only the first `points`
    observations, but the supervision covers the whole simulated window
    (free at amortization time), i.e. exactly the deployed
    forecast-from-a-prefix task. Best-iterate selection on the held-out
    windows' data loss initializes at the distilled encoder, so stage 2
    can only improve the selection metric. Dispatches are host-chunked
    (`finetune_chunk` steps per device program) because each step is a
    grad-of-ODE-solve — a monolithic multi-minute scan can kill remote
    TPU workers (see inference/mcmc.py dispatch_chunk).

    No reference counterpart: the reference has no subject conditioning at
    all. This is the amortized-inference step of the standard
    optimize-then-distill recipe (cf. amortized VI / learned initializers).

    Returns `(enc_params, info)`: an encoder pytree compatible with
    `encode_context(enc_params, obs, ts, points)` — inject its codes via
    `Controls(signals={'context': ...})`, or stash it as `params['enc']`
    alongside `dataclasses.replace(config, context_points=points)` — and a
    dict with target/val statistics.
    """
    import optax

    from hybrid_ode_tpu.dynamics.residual import init_mlp_params

    k = points if points is not None else config.context_points
    key = key if key is not None else jax.random.PRNGKey(0)
    if targets is None:
        targets = identify_context(params, batch, config, steps=id_steps,
                                   lr=id_lr, prior_std=prior_std, points=k)
    targets = jax.lax.stop_gradient(jnp.asarray(targets))
    B, out_dim = targets.shape

    obs = jnp.asarray(batch["observations"])
    ts = jnp.asarray(batch["time_points"])
    n = obs.shape[-1]

    key, ik, sk = jax.random.split(key, 3)
    enc = init_mlp_params(ik, input_dim=k * (n + 1), hidden_dim=hidden,
                          output_dim=out_dim, n_layers=n_layers,
                          dtype=obs.dtype)
    # regression head: small non-zero output init (the zero init that makes
    # sense for residuals would start at the population code and stall)
    wlast = f"w{n_layers}"
    enc[wlast] = 0.05 * jax.random.normal(jax.random.fold_in(ik, 1),
                                          enc[wlast].shape, obs.dtype)

    perm = jax.random.permutation(sk, B)
    n_val = max(1, int(val_frac * B)) if B > 4 else 0
    val_idx, tr_idx = perm[:n_val], perm[n_val:]

    def code_mse(e, idx):
        pred = encode_context(e, obs[idx], ts[idx], k, config.activation)
        return jnp.mean((pred - targets[idx]) ** 2)

    opt = optax.adamw(lr, weight_decay=weight_decay)

    def step(carry, _):
        e, os_, best_e, best_v = carry
        loss, g = jax.value_and_grad(code_mse)(e, tr_idx)
        upd, os_ = opt.update(g, os_, e)
        e = optax.apply_updates(e, upd)
        v = code_mse(e, val_idx) if n_val else loss
        better = v < best_v
        best_e = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), e, best_e)
        return (e, os_, best_e, jnp.minimum(v, best_v)), loss

    carry0 = (enc, opt.init(enc), enc, jnp.asarray(jnp.inf, obs.dtype))
    (_, _, best_enc, best_val), losses = jax.lax.scan(
        step, carry0, None, length=epochs)

    info = {
        "points": k,
        "n_windows": int(B),
        "val_code_mse": float(best_val),
        "final_train_mse": float(losses[-1]),
        "target_code_std": float(jnp.std(targets)),
    }

    if finetune_epochs > 0:
        # stage 2: decoder-aware fine-tune on the full-window data loss
        y0 = jnp.asarray(batch["initial_state"])
        mask = batch.get("mask")
        mask_f = (jnp.asarray(mask) if mask is not None
                  else jnp.ones(ts.shape, obs.dtype))
        ext = batch.get("external_inputs") or {}
        sig = {nm: jnp.asarray(v) for nm, v in ext.items()}
        w_state = batch.get("loss_weights")
        w_state = (jnp.asarray(w_state) if w_state is not None
                   else jnp.ones((n,), obs.dtype))
        denom = jnp.maximum(jnp.sum(mask_f, axis=1) * n, 1.0)  # (B,)

        def data_loss(e, idx):
            ctx = encode_context(e, obs[idx], ts[idx], k, config.activation)
            ctrls = Controls(
                ts=ts[idx],
                signals=dict({nm: v[idx] for nm, v in sig.items()},
                             context=ctx))
            preds = batched_forward(params, y0[idx], ts[idx], ctrls, config)
            se = ((preds - obs[idx]) ** 2) * w_state * mask_f[idx][..., None]
            se = jnp.nan_to_num(se, nan=1e6, posinf=1e6)
            return jnp.mean(jnp.sum(se, axis=(1, 2)) / denom[idx])

        val_or_tr = val_idx if n_val else tr_idx
        opt_ft = optax.adam(finetune_lr)

        def ft_step(carry, _):
            e, os_, best_e, best_v = carry
            loss, g = jax.value_and_grad(data_loss)(e, tr_idx)
            g = jax.tree.map(jnp.nan_to_num, g)
            upd, os_ = opt_ft.update(g, os_)
            e = optax.apply_updates(e, upd)
            v = data_loss(e, val_or_tr)
            better = v < best_v
            best_e = jax.tree.map(
                lambda a, b: jnp.where(better, a, b), e, best_e)
            return (e, os_, best_e, jnp.minimum(v, best_v)), loss

        @functools.partial(jax.jit, static_argnums=1)
        def ft_chunk(carry, length):
            return jax.lax.scan(ft_step, carry, None, length=length)

        val0 = data_loss(best_enc, val_or_tr)
        carry = (best_enc, opt_ft.init(best_enc), best_enc, val0)
        done = 0
        ft_losses = []
        while done < finetune_epochs:
            step_n = min(finetune_chunk, finetune_epochs - done)
            carry, chunk_losses = ft_chunk(carry, step_n)
            jax.block_until_ready(carry[3])
            ft_losses.append(jnp.asarray(chunk_losses))
            done += step_n
        _, _, best_enc, best_ft = carry
        ft_losses = jnp.concatenate(ft_losses)
        info["val_data_loss_distilled"] = float(val0)
        info["val_data_loss_finetuned"] = float(best_ft)
        info["finetune_train_first"] = float(ft_losses[0])
        info["finetune_train_last"] = float(ft_losses[-1])

    return best_enc, info


def segment_batch(batch: Mapping[str, Any], k: int) -> Dict[str, Any]:
    """Multiple-shooting view: split each (T-point) window into k segments,
    each re-initialised from the OBSERVED state at its left edge.

    Returns a virtual batch of B*k windows with (T-1)/k + 1 points each.
    Requires (T-1) % k == 0.
    """
    obs = batch["observations"]          # (B, T, n)
    ts = batch["time_points"]            # (B, T)
    B, T = ts.shape
    if (T - 1) % k != 0:
        raise ValueError(f"shooting_segments={k} must divide T-1={T-1}")
    L = (T - 1) // k
    # segment point indices: (k, L+1) -> s*L + [0..L]
    idx = (jnp.arange(k)[:, None] * L + jnp.arange(L + 1)[None, :]).reshape(-1)

    def seg(x, point_axis=1):
        xs = jnp.take(x, idx, axis=point_axis)  # (B, k*(L+1), ...)
        new_shape = x.shape[:point_axis] + (k, L + 1) + x.shape[point_axis + 1 :]
        xs = xs.reshape(new_shape)
        # merge (B, k) -> B*k leading axis
        return xs.reshape((B * k, L + 1) + x.shape[point_axis + 1 :])

    out: Dict[str, Any] = {
        "observations": seg(obs),
        "time_points": seg(ts),
        "external_inputs": {name: seg(v) for name, v in (batch.get("external_inputs") or {}).items()},
    }
    out["initial_state"] = out["observations"][:, 0]
    if batch.get("loss_weights") is not None:
        out["loss_weights"] = batch["loss_weights"]
    if batch.get("mask") is not None:
        m = seg(batch["mask"])
        # a segment whose left-edge state is unobserved can't be shot from it:
        # zero its whole contribution
        m = m * m[:, :1]
        out["mask"] = m
        if batch.get("mask_channels") is not None:
            mc = seg(batch["mask_channels"])
            out["mask_channels"] = mc * m[..., None]
    return out


def controls_from_batch(batch: Mapping[str, Any]) -> Optional[Controls]:
    """Build per-sample Controls from a data batch's external inputs."""
    ext = batch.get("external_inputs")
    if not ext:
        return None
    return Controls(ts=batch["time_points"], signals=dict(ext))


def hybrid_loss(
    params: Mapping[str, Any],
    batch: Mapping[str, Any],
    key: jax.Array,
    config: HybridConfig = HybridConfig(),
    lambda1: float = 1.0,
    lambda2: float = 1.0,
    use_physics_loss: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined loss; returns (total, components dict).

    batch keys: initial_state (B,n), observations (B,T,n), time_points (B,T),
    external_inputs {name: (B,T)}, optional mask (B,T) for irregular
    sampling, optional mask_channels (B,T,n) for per-CHANNEL missingness
    (round 3: clinical charting observes channels independently — the data
    loss then weights each (point, channel) by its own observation bit).
    """
    if config.shooting_segments > 1:
        batch = segment_batch(batch, config.shooting_segments)

    y0 = batch["initial_state"]
    obs = batch["observations"]
    ts = batch["time_points"]
    controls = controls_from_batch(batch)
    controls = with_context(params, batch, controls, config)
    mask = batch.get("mask")

    # Surface solver health: an adaptive interval that exhausts its step
    # budget (done=False) no longer fails silently — the success fraction
    # rides the metrics dict and the train loop warns on < 1 (the reference
    # at least logs + zero-pads failed solves, hybrid_ode_nn.py:243-256).
    solver_success = jnp.asarray(1.0)
    if _has_step_stats(config) and not config.use_pallas:
        preds, stats = batched_forward(
            params, y0, ts, controls, config, return_stats=True
        )
        solver_success = jnp.mean(stats.success.astype(preds.dtype))
    else:
        preds = batched_forward(params, y0, ts, controls, config)

    # per-state inverse-variance weights (identity for z-scored data; for
    # physical-units training they reproduce z-scored MSE while the dynamics
    # stay physically meaningful)
    w_state = batch.get("loss_weights")
    se = (preds - obs) ** 2
    if w_state is not None:
        se = se * w_state
    mask_ch = batch.get("mask_channels")
    if mask_ch is not None:
        data_loss = jnp.sum(mask_ch * se) / (jnp.sum(mask_ch) + 1e-8)
    elif mask is None:
        data_loss = jnp.mean(se)
    else:
        w = mask[..., None]
        data_loss = jnp.sum(w * se) / (jnp.sum(w) * obs.shape[-1] + 1e-8)

    physics_loss = jnp.zeros((), preds.dtype)
    if use_physics_loss and lambda1 > 0:
        T = obs.shape[1]
        n_pts = min(config.n_physics_points, T - 1)
        idx = jax.random.permutation(key, T - 1)[:n_pts]  # shared across batch,
        # like the reference's single randperm per batch (`hybrid_ode_nn.py:301`)

        t_l = jnp.take(ts, idx, axis=1)          # (B, P)
        t_r = jnp.take(ts, idx + 1, axis=1)
        y_l = jnp.take(preds, idx, axis=1)       # (B, P, n)
        y_r = jnp.take(preds, idx + 1, axis=1)
        dt = (t_r - t_l)[..., None]
        fd = (y_r - y_l) / jnp.where(dt == 0, 1.0, dt)
        # Compare the finite difference against the RHS at the interval
        # MIDPOINT (t_mid, (y_l+y_r)/2): O(h^2)-consistent pairing. The
        # reference pairs FD with the left-endpoint RHS (O(h) bias,
        # `hybrid_ode_nn.py:324-330`), which systematically penalises sharp
        # meal transients and measurably degrades the fit.
        t_m = 0.5 * (t_l + t_r)
        y_m = 0.5 * (y_l + y_r)

        def rhs_at(t_b, y_b, c_b):  # per sample: (P,), (P,n)
            return jax.vmap(lambda t, y: hybrid_field(t, y, params, c_b, config))(t_b, y_b)

        ctrl_axes = None if controls is None else Controls(
            ts=0, signals={k: 0 for k in controls.signals}
        )
        rhs = jax.vmap(rhs_at, in_axes=(0, 0, ctrl_axes))(t_m, y_m, controls)
        pe = (fd - rhs) ** 2
        if w_state is not None:
            pe = pe * w_state
        physics_loss = jnp.mean(pe)

    reg_loss = jnp.zeros((), preds.dtype)
    if lambda2 > 0 and config.use_nn:
        reg_loss = mlp_l2(params["nn"], l2_weight=lambda2)

    total = data_loss + lambda1 * physics_loss + lambda2 * reg_loss
    return total, {"data": data_loss, "physics": physics_loss, "reg": reg_loss,
                   "solver_success": solver_success}


# ---------------------------------------------------------------------------
# Flat-named parameter views (VI / MCMC / checkpoint interop)
# ---------------------------------------------------------------------------

def params_to_flat(params: Mapping[str, Any]) -> Dict[str, jnp.ndarray]:
    """Nested {'ode': {...}, 'nn': {...}} -> flat {'ode_a_GI': ..., 'nn_w0': ...}.

    Naming parity with the reference's VI parameter registry
    (`models/hybrid_ode_nn.py:84-91`)."""
    flat = {f"ode_{k}": v for k, v in params["ode"].items()}
    flat.update({f"nn_{k}": v for k, v in params["nn"].items()})
    return flat


def flat_to_params(
    flat: Mapping[str, jnp.ndarray], template: Mapping[str, Any]
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Merge flat-named overrides onto a nested template pytree.

    Carries ALL template groups (incl. 'norm' / 'enc') so VI/MCMC posteriors
    over {ode, nn} evaluate correctly for normalized-state or
    context-conditioned models."""
    out = {k: dict(v) for k, v in template.items()}
    for name, value in flat.items():
        if name.startswith("ode_"):
            out["ode"][name[4:]] = value
        elif name.startswith("nn_"):
            out["nn"][name[3:]] = value
        else:
            raise KeyError(f"unknown parameter prefix: {name}")
    return out


def forward_with_params(
    flat_params: Mapping[str, jnp.ndarray],
    template: Mapping[str, Any],
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    controls: Optional[Controls] = None,
    config: HybridConfig = HybridConfig(),
    **solver_overrides,
) -> jnp.ndarray:
    """API-parity helper: forward pass under substituted parameters.

    The reference mutates-and-restores module buffers
    (`models/hybrid_ode_nn.py:381-438`); functionally this is one dict merge."""
    merged = flat_to_params(flat_params, template)
    if y0.ndim == 2:
        return batched_forward(merged, y0, ts, controls, config, **solver_overrides)
    return forward(merged, y0, ts, controls, config, **solver_overrides)
