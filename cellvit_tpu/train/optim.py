"""Optimizer registry (optax) and LR schedules.

Mirrors the reference's torch registries: `base_ml/base_optim.py:24-37`
(OPTI_DICT) and the constant/exponential/cosine schedules of
`experiment_cellvit_pannuke.py:415-465`. Optimizers are optax gradient
transforms built from torch-style hyperparameter dicts (lr, betas, eps,
weight_decay, momentum, …); schedules are per-epoch multipliers evaluated
from the global step with a static steps_per_epoch, so LR changes stay
inside the jitted update.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import optax


def _betas(kw: Dict) -> tuple:
    return tuple(kw.get("betas", (0.9, 0.999)))


def _l2(kw: Dict, inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """torch-style coupled weight decay: L2 added to the gradient BEFORE
    the adaptive scaling (all torch optimizers except AdamW)."""
    wd = kw.get("weight_decay", 0.0)
    if wd:
        return optax.chain(optax.add_decayed_weights(wd), inner)
    return inner


def _adam(kw: Dict) -> optax.GradientTransformation:
    b1, b2 = _betas(kw)
    wd = kw.get("weight_decay", 0.0)
    base = optax.scale_by_adam(b1=b1, b2=b2, eps=kw.get("eps", 1e-8))
    if wd:
        # torch Adam's weight_decay is L2 added to the gradient
        return optax.chain(optax.add_decayed_weights(wd), base)
    return base


def _adamw(kw: Dict) -> optax.GradientTransformation:
    b1, b2 = _betas(kw)
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=kw.get("eps", 1e-8)),
        optax.add_decayed_weights(kw.get("weight_decay", 1e-2)),
    )


def _sgd(kw: Dict) -> optax.GradientTransformation:
    parts = []
    if kw.get("weight_decay", 0.0):
        parts.append(optax.add_decayed_weights(kw["weight_decay"]))
    m = kw.get("momentum", 0.0)
    if m:
        parts.append(
            optax.trace(decay=m, nesterov=kw.get("nesterov", False))
        )
    return optax.chain(*parts) if parts else optax.identity()


def _rmsprop(kw: Dict) -> optax.GradientTransformation:
    return _l2(kw, optax.chain(
        optax.scale_by_rms(decay=kw.get("alpha", 0.99), eps=kw.get("eps", 1e-8)),
        optax.trace(decay=kw.get("momentum", 0.0))
        if kw.get("momentum", 0.0)
        else optax.identity(),
    ))


def _radam(kw: Dict) -> optax.GradientTransformation:
    b1, b2 = _betas(kw)
    return _l2(kw, optax.scale_by_radam(b1=b1, b2=b2, eps=kw.get("eps", 1e-8)))


def _adagrad(kw: Dict) -> optax.GradientTransformation:
    return _l2(kw, optax.scale_by_rss(
        initial_accumulator_value=kw.get("initial_accumulator_value", 0.0),
        eps=kw.get("eps", 1e-10),
    ))


def _adadelta(kw: Dict) -> optax.GradientTransformation:
    return _l2(kw, optax.scale_by_adadelta(
        rho=kw.get("rho", 0.9), eps=kw.get("eps", 1e-6)
    ))


def _adamax(kw: Dict) -> optax.GradientTransformation:
    b1, b2 = _betas(kw)
    return _l2(kw, optax.scale_by_adamax(b1=b1, b2=b2, eps=kw.get("eps", 1e-8)))


def _sparse_adam(kw: Dict) -> optax.GradientTransformation:
    """torch.optim.SparseAdam ≡ Adam on the touched coordinates; with the
    dense gradients of this framework that is exactly Adam (SparseAdam has
    no weight_decay parameter)."""
    return _adam({k: v for k, v in kw.items() if k != "weight_decay"})


def _asgd(kw: Dict) -> optax.GradientTransformation:
    """torch.optim.ASGD parameter trajectory: per-step
    p ← p·(1 − λ·η_t) − η_t·(g + wd·p), η_t = lr/(1 + λ·lr·t)^α with η_0 =
    lr (the Polyak average lives in torch's state and never feeds back
    into the iterates). Emitted as (g + (wd+λ)·p)·(η_t/lr) so the chained
    `-lr·schedule` produces torch's update exactly."""
    import jax
    import jax.numpy as jnp

    lambd = kw.get("lambd", 1e-4)
    alpha = kw.get("alpha", 0.75)
    lr0 = kw.get("_base_lr", 1e-2)
    wd = kw.get("weight_decay", 0.0)

    def init(params):
        return {"t": jnp.zeros([], jnp.int32)}

    def update(updates, state, params=None):
        t = state["t"]
        factor = 1.0 / (1.0 + lambd * lr0 * t) ** alpha  # η_t / lr
        if params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: (g + (wd + lambd) * p) * factor, updates, params
            )
        else:
            updates = jax.tree_util.tree_map(lambda g: g * factor, updates)
        return updates, {"t": t + 1}

    return optax.GradientTransformation(init, update)


def _rprop(kw: Dict) -> optax.GradientTransformation:
    """torch.optim.Rprop: per-parameter sign-adaptive step sizes
    (etas 0.5/1.2, bounds 1e-6/50, lr = initial step). On a sign flip the
    step shrinks and the coordinate is frozen for that update (torch zeroes
    the gradient). Emits the full update; pair with scale(-1), not an LR
    schedule — torch reads lr only at state init too."""
    import jax
    import jax.numpy as jnp

    eta_minus, eta_plus = kw.get("etas", (0.5, 1.2))
    step_min, step_max = kw.get("step_sizes", (1e-6, 50.0))
    lr = kw.get("_base_lr", 1e-2)

    def init(params):
        return {
            "prev_grad": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step_size": jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, lr), params
            ),
        }

    def update(updates, state, params=None):
        tm = jax.tree_util.tree_map

        def ss_fn(g, pg, ss):
            sign = jnp.sign(g * pg)
            return jnp.clip(
                jnp.where(
                    sign > 0, ss * eta_plus,
                    jnp.where(sign < 0, ss * eta_minus, ss),
                ),
                step_min, step_max,
            )

        new_ss = tm(ss_fn, updates, state["prev_grad"], state["step_size"])
        g_eff = tm(
            lambda g, pg: jnp.where(jnp.sign(g * pg) < 0, 0.0, g),
            updates, state["prev_grad"],
        )
        upd = tm(lambda g, s: jnp.sign(g) * s, g_eff, new_ss)
        return upd, {"prev_grad": g_eff, "step_size": new_ss}

    return optax.GradientTransformation(init, update)


def _lbfgs(kw: Dict) -> optax.GradientTransformation:
    """L-BFGS direction scaling (optax.scale_by_lbfgs); the reference's
    torch LBFGS line search is replaced by the LR schedule step size."""
    return optax.scale_by_lbfgs(memory_size=kw.get("history_size", 10))


OPTI_DICT: Dict[str, Callable[[Dict], optax.GradientTransformation]] = {
    "Adadelta": _adadelta,
    "Adagrad": _adagrad,
    "Adam": _adam,
    "AdamW": _adamw,
    "Adamax": _adamax,
    "RAdam": _radam,
    "RMSprop": _rmsprop,
    "SGD": _sgd,
    "SparseAdam": _sparse_adam,
    "ASGD": _asgd,
    "Rprop": _rprop,
    "LBFGS": _lbfgs,
}


def constant_schedule_multiplier(epoch):
    """The reference's 'constant' schedule: ×1 for 25 epochs, ×0.1 for 25,
    ×1 for 25, then ×0.1 (experiment_cellvit_pannuke.py:442-452)."""
    import jax.numpy as jnp

    return jnp.where(
        epoch < 25, 1.0,
        jnp.where(epoch < 50, 0.1, jnp.where(epoch < 75, 1.0, 0.1)),
    )


def make_lr_schedule(
    scheduler_type: str,
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    gamma: float = 0.95,
    eta_min: float = 1e-5,
) -> Callable:
    """step → learning rate; the epoch index is derived from the step so the
    schedule lives inside jit (the reference steps its scheduler per epoch).
    """
    import jax.numpy as jnp

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        t = scheduler_type.lower()
        if t == "exponential":
            return base_lr * gamma**epoch
        if t == "cosine":
            frac = jnp.minimum(epoch / max(epochs, 1), 1.0)
            return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * frac))
        if t == "constant":
            return base_lr * constant_schedule_multiplier(epoch)
        return jnp.asarray(base_lr, jnp.float32)

    return schedule


def retrieve_optimizer(
    name: str, hyperparams: Dict, lr_schedule: Callable
) -> optax.GradientTransformation:
    """Build `-lr(step) * transform(grads)` for a named optimizer."""
    if name not in OPTI_DICT:
        raise KeyError(f"unknown optimizer {name}; options: {sorted(OPTI_DICT)}")
    kw = dict(hyperparams)
    base_lr = kw.pop("lr", None)
    if base_lr is not None:
        kw["_base_lr"] = base_lr
    if name == "Rprop":
        # lr is the initial per-parameter step size; the step sizes then
        # evolve on their own (torch also only reads lr at init)
        return optax.chain(OPTI_DICT[name](kw), optax.scale(-1.0))
    if name != "ASGD":  # only ASGD's internal eta decay needs the base lr
        kw.pop("_base_lr", None)
    return optax.chain(
        OPTI_DICT[name](kw),
        optax.scale_by_learning_rate(lr_schedule),
    )
