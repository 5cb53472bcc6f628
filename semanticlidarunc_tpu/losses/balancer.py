"""Adaptive loss balancing (GradNorm / target-share) + weight schedules.

Port of /root/reference/src/utils/grad_norm.py and the schedule helpers in
/root/reference/src/models/trainer.py:109-152. The balancer itself is scalar
host-side state updated every `eq_interval` steps from per-term gradient
norms; the norms are measured ON DEVICE in a single jitted computation
(`per_term_grad_norms`) — one fused backward per term via jacrev instead of
the reference's K sequential `autograd.grad(retain_graph=True)` passes
(grad_norm.py:155-167). The share-cap controller keeps explicit per-loss
state objects instead of the reference's module-global `_CAP_STATES`
(grad_norm.py:449-457).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable

import jax
import jax.numpy as jnp

# Grad-norm measurement cadence (steps between balancer updates); single
# source of truth — the Trainer reads this (reference trainer.py:604 `do_eq`).
EQ_INTERVAL = 10


# ---------------------------------------------------------------------------
# on-device per-term gradient norms
# ---------------------------------------------------------------------------

def default_ref_mask(params) -> dict:
    """Pytree mask selecting GradNorm reference params: conv/dense kernels,
    excluding biases and norm scales (reference select_ref_params with
    exclude_bias_norm=True, grad_norm.py:257-279)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def keep(path) -> bool:
        names = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(names).lower()
        if joined.endswith("bias"):
            return False
        if "norm" in joined or "bn" in joined:
            return False
        return True

    treedef = jax.tree_util.tree_structure(params)
    leaves = [keep(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def per_term_grad_norms(terms_fn: Callable, ref_mask) -> Callable:
    """Build a jitted fn: params, *args -> (term_values, term_grad_norms).

    `terms_fn(params, *args) -> dict[str, scalar]`. The returned fn computes
    the L2 norm of each term's gradient w.r.t. the masked params in ONE
    compiled computation (jacrev over the stacked term vector).
    """
    def fn(p, *args):
        names = sorted(terms_fn(p, *args).keys())

        def stacked(p_):
            t = terms_fn(p_, *args)
            return jnp.stack([t[k] for k in names])

        vals = stacked(p)
        jac = jax.jacrev(stacked)(p)

        def leaf_sq(mask_leaf, g_leaf):
            if not mask_leaf:
                return jnp.zeros((len(names),), jnp.float32)
            g2 = (g_leaf.astype(jnp.float32) ** 2)
            return g2.reshape(len(names), -1).sum(axis=1)

        sq = sum(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(leaf_sq, ref_mask, jac,
                                   is_leaf=lambda x: isinstance(x, bool))))
        norms = jnp.sqrt(sq)
        return dict(zip(names, vals)), dict(zip(names, norms))

    return fn


def discover_ref_mask(terms_fn: Callable, params, args, min_terms: int = 2,
                      exclude_bias_norm: bool = True):
    """Pytree mask of params that receive nonzero gradients from at least
    `min_terms` loss terms (reference discover_shared_params_from_losses,
    grad_norm.py:282-320). One jacrev over the stacked terms; run once at
    init and cache the mask."""
    base = default_ref_mask(params) if exclude_bias_norm else \
        jax.tree_util.tree_map(lambda _: True, params)

    def stacked(p):
        t = terms_fn(p, *args)
        return jnp.stack([t[k] for k in sorted(t)])

    jac = jax.jit(jax.jacrev(stacked))(params)
    n_terms = len(jax.tree_util.tree_leaves(jac)[0])

    def leaf_mask(base_leaf, g_leaf):
        if not base_leaf:
            return False
        per_term = jnp.any(
            (g_leaf != 0.0) & jnp.isfinite(g_leaf),
            axis=tuple(range(1, g_leaf.ndim)))
        return int(jnp.sum(per_term)) >= min(min_terms, n_terms)

    mask = jax.tree_util.tree_map(leaf_mask, base, jac,
                                  is_leaf=lambda x: isinstance(x, bool))
    if not any(jax.tree_util.tree_leaves(mask)):
        return base  # fallback: keep the static mask
    return mask


# ---------------------------------------------------------------------------
# schedules (reference trainer.py:109-152)
# ---------------------------------------------------------------------------

def cosine_weight_ramp(step: int, total: int, w0: float, w_peak: float,
                       w_end: float, warm_frac: float, hold_frac: float) -> float:
    """Warmup -> hold -> cosine decay."""
    s = step / max(1, total)
    if s <= warm_frac:
        return w0 + (w_peak - w0) * (s / warm_frac)
    if s <= hold_frac:
        return w_peak
    t = (s - hold_frac) / (1.0 - hold_frac)
    return w_end + 0.5 * (w_peak - w_end) * (1.0 + math.cos(math.pi * min(t, 1.0)))


def cosine_share_cap(step: int, total: int, cap_start: float, cap_end: float,
                     hold_frac: float) -> float:
    """Hold -> cosine decay of a share cap."""
    s = step / max(1, total)
    if s <= hold_frac:
        return cap_start
    t = (s - hold_frac) / (1.0 - hold_frac)
    return cap_end + 0.5 * (cap_start - cap_end) * (1.0 + math.cos(math.pi * min(t, 1.0)))


def nb_share_schedule(step: int, total: int) -> Dict[str, float]:
    """Piecewise target shares for {nll, brier} (reference :145-152)."""
    r = step / max(1, total)
    if r < 0.15:
        return {"nll": 0.75, "brier": 0.25}
    if r < 0.40:
        return {"nll": 0.60, "brier": 0.40}
    return {"nll": 0.55, "brier": 0.45}


# ---------------------------------------------------------------------------
# AdaptiveLossBalancer (reference grad_norm.py:69-254)
# ---------------------------------------------------------------------------

class AdaptiveLossBalancer:
    """Scalar loss reweighter: 'gradnorm' | 'share' | 'hybrid'.

    Call `.step(losses, grad_norms, global_step)` with host floats measured by
    `per_term_grad_norms`; returns {name: weight}. Average weight over the
    managed names is renormalized to 1.0 each update.
    """

    def __init__(self, names: Iterable[str], mode: str = "gradnorm", *,
                 alpha: float = 0.5, lr_mult: float = 1.0,
                 target_share: Dict[str, float] | None = None,
                 power: float = 0.7, ema_beta_g: float = 0.95,
                 ema_beta_L: float = 0.90, ema_floor: float = 1e-8,
                 inactive_frac_of_median: float = 0.05, min_w: float = 0.05,
                 max_w: float = 10.0, step_cap: float = 1.5,
                 start_step_gradnorm: int = 0):
        self.names = list(names)
        self.mode = mode.lower()
        assert self.mode in {"gradnorm", "share", "hybrid"}
        self.alpha = float(alpha)
        self.lr_mult = float(lr_mult)
        self.power = float(power)
        self.beta_g = float(ema_beta_g)
        self.beta_L = float(ema_beta_L)
        self.ema_floor = float(ema_floor)
        self.inactive_frac = float(inactive_frac_of_median)
        self.min_w = float(min_w)
        self.max_w = float(max_w)
        self.step_cap = float(step_cap)
        self.switch_step = int(start_step_gradnorm)

        self.w = {k: 1.0 for k in self.names}
        self.g_ema = {k: 0.0 for k in self.names}
        self.L0: Dict[str, float] = {}
        self.L_ema: Dict[str, float | None] = {k: None for k in self.names}
        if target_share is None:
            target_share = {k: 1.0 for k in self.names}
        self.set_target_share(target_share)
        self._step_idx = 0
        self.last_g_raw: Dict[str, float] = {}
        self.last_eff_g: Dict[str, float] = {}

    def set_target_share(self, share: Dict[str, float]):
        s = sum(max(0.0, float(share.get(k, 0.0))) for k in self.names) + 1e-12
        self.share = {k: float(share.get(k, 0.0)) / s for k in self.names}

    def _avg1(self, keys):
        avg = sum(self.w[k] for k in keys) / (len(keys) + 1e-12)
        for k in keys:
            self.w[k] /= (avg + 1e-12)

    def _inactive_filter(self, keys):
        vals = [self.g_ema[k] for k in keys]
        med = sorted(vals)[len(vals) // 2] if vals else 0.0
        thr = max(self.ema_floor, self.inactive_frac * max(med, self.ema_floor))
        act = [k for k in keys if self.g_ema[k] >= thr]
        return act if act else keys

    def get_weights(self, keys=None) -> Dict[str, float]:
        keys = list(self.w.keys()) if keys is None else list(keys)
        avg = sum(self.w[k] for k in keys) / (len(keys) + 1e-12)
        return {k: float(self.w[k] / (avg + 1e-12)) for k in keys}

    def step(self, losses: Dict[str, float], grad_norms: Dict[str, float],
             global_step: int) -> Dict[str, float]:
        self._step_idx = int(global_step)
        keys = [k for k in self.names if k in losses]

        for k in keys:
            g = float(grad_norms.get(k, 0.0))
            self.g_ema[k] = self.beta_g * self.g_ema[k] + \
                (1 - self.beta_g) * math.log(max(g, 1e-12))
        g_sm = {k: max(math.exp(self.g_ema[k]), self.ema_floor) for k in keys}
        self.last_g_raw = {k: float(grad_norms.get(k, 0.0)) for k in keys}
        self.last_eff_g = {k: float(self.w[k] * g_sm[k]) for k in keys}

        for k in keys:
            lk = float(losses[k])
            if k not in self.L0:
                self.L0[k] = max(lk, 1e-12)
            prev = self.L_ema[k]
            self.L_ema[k] = (self.beta_L * prev + (1 - self.beta_L) * lk) \
                if prev is not None else lk

        use_gradnorm = (self.mode == "gradnorm") or \
            (self.mode == "hybrid" and self._step_idx >= self.switch_step)
        if use_gradnorm:
            self._update_gradnorm(keys, g_sm)
        else:
            self._update_share(keys, g_sm)
        return {k: float(self.w[k]) for k in keys}

    def _update_gradnorm(self, keys, g_sm):
        active = self._inactive_filter(keys)
        r = {k: max((self.L_ema[k] or 0.0) / self.L0[k], 1e-12) for k in active}
        rpow = {k: r[k] ** self.alpha for k in active}
        mean_rpow = sum(rpow.values()) / (len(active) + 1e-12)
        rstar = {k: rpow[k] / (mean_rpow + 1e-12) for k in active}
        G = {k: self.w[k] * g_sm[k] for k in active}
        gbar = sum(G.values()) / (len(active) + 1e-12)
        for k in active:
            ratio = ((gbar * rstar[k]) / (G[k] + 1e-12)) ** self.lr_mult
            ratio = float(min(max(ratio, 1.0 / self.step_cap), self.step_cap))
            self.w[k] = float(min(max(self.w[k] * ratio, self.min_w), self.max_w))
        for k in keys:
            if k not in active:
                self.w[k] = 0.9 * self.w[k] + 0.1
        self._avg1(keys)

    def _update_share(self, keys, g_sm):
        active = [k for k in keys if self.share.get(k, 0.0) > 0.0]
        if not active:
            return
        active = self._inactive_filter(active)
        tot = sum(max(0.0, self.share.get(k, 0.0)) for k in active) + 1e-12
        sh = {k: self.share.get(k, 0.0) / tot for k in active}
        raw = {k: sh[k] / (g_sm[k] + 1e-12) for k in active}
        gm = math.exp(sum(math.log(max(v, 1e-12)) for v in raw.values()) /
                      len(active))
        m_des = {k: raw[k] / gm for k in active}
        for k in active:
            ratio = (m_des[k] / (self.w[k] + 1e-12)) ** self.power
            ratio = float(min(max(ratio, 1.0 / self.step_cap), self.step_cap))
            self.w[k] = float(min(max(self.w[k] * ratio, self.min_w), self.max_w))
        for k in keys:
            if k not in active:
                self.w[k] = 0.9 * self.w[k] + 0.1
        self._avg1(keys)


# ---------------------------------------------------------------------------
# share-cap controller (reference grad_norm.py:449-579, explicit state)
# ---------------------------------------------------------------------------

@dataclass
class CapState:
    ema_g_ref: float | None = None
    ema_g_cur: float | None = None
    w_prev: float | None = None
    bind_ctr: int = 0


class ShareCapController:
    """Per-loss cap: effective grad of a scheduled term <= cap * eff(reference).

    Stateful per name; EMA-smoothed grad norms, asymmetric per-step ratio caps
    (+12% / -8%), adaptive tightening after sustained binding, and an
    emergency 25% cut — reference `_apply_share_cap_vs_reference` semantics.
    """

    def __init__(self, ema_beta: float = 0.95, grad_floor: float = 1e-9,
                 ratio_cap_up: float = 1.12, ratio_cap_dn: float = 0.92,
                 adaptive_tighten_after: int = 5,
                 adaptive_ratio_cap_dn: float = 0.85,
                 emergency_patience: int = 2, emergency_violation: float = 1.5,
                 emergency_factor: float = 0.75,
                 emergency_loosen_down_cap: bool = True):
        self.cfg = dict(ema_beta=ema_beta, grad_floor=grad_floor,
                        ratio_cap_up=ratio_cap_up, ratio_cap_dn=ratio_cap_dn,
                        adaptive_tighten_after=adaptive_tighten_after,
                        adaptive_ratio_cap_dn=adaptive_ratio_cap_dn,
                        emergency_patience=emergency_patience,
                        emergency_violation=emergency_violation,
                        emergency_factor=emergency_factor,
                        emergency_loosen_down_cap=emergency_loosen_down_cap)
        self.states: Dict[str, CapState] = {}

    def apply(self, name: str, w_scheduled: float, g_current_raw: float,
              g_reference_raw: float, w_ref: float, cap_ratio: float) -> float:
        c = self.cfg
        st = self.states.setdefault(name, CapState())
        if st.ema_g_ref is None:
            st.ema_g_ref = float(g_reference_raw)
            st.ema_g_cur = float(g_current_raw)
        else:
            b = c["ema_beta"]
            st.ema_g_ref = b * st.ema_g_ref + (1 - b) * g_reference_raw
            st.ema_g_cur = b * st.ema_g_cur + (1 - b) * g_current_raw
        g_ref = max(st.ema_g_ref, c["grad_floor"])
        g_cur = max(st.ema_g_cur, c["grad_floor"])
        eff_ref = float(w_ref) * g_ref
        limit = cap_ratio * max(eff_ref, c["grad_floor"])
        if st.w_prev is None:
            st.w_prev = float(w_scheduled)
        eff_applied = st.w_prev * g_cur
        eff_sched = float(w_scheduled) * g_cur

        if eff_sched > limit and limit > 0.0:
            w_target = min(limit / g_cur, float(w_scheduled))
        else:
            w_target = float(w_scheduled)

        local_dn = c["ratio_cap_dn"]
        if eff_applied > limit:
            st.bind_ctr += 1
            if st.bind_ctr >= c["emergency_patience"] and \
                    eff_applied > c["emergency_violation"] * limit:
                w_target = max(c["grad_floor"],
                               w_target * c["emergency_factor"])
                if c["emergency_loosen_down_cap"]:
                    local_dn = min(local_dn, c["emergency_factor"])
        else:
            st.bind_ctr = 0
        if st.bind_ctr >= c["adaptive_tighten_after"]:
            local_dn = min(local_dn, c["adaptive_ratio_cap_dn"])

        ratio = w_target / max(st.w_prev, c["grad_floor"])
        if not (0.0 < ratio < float("inf")):
            ratio = 1.0
        ratio = min(ratio, c["ratio_cap_up"]) if ratio >= 1.0 \
            else max(ratio, local_dn)
        w_new = st.w_prev * ratio
        if w_scheduled > 0.0:
            w_new = min(w_new, 2.0 * float(w_scheduled))
        w_new = max(w_new, c["grad_floor"])
        st.w_prev = w_new
        return float(w_new)
