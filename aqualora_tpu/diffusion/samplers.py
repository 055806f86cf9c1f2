"""The 11-sampler menu, TPU-first.

The reference exposes 11 diffusers schedulers by name
(`evaluation/utils_eval.py:83-106`): ddim, euler, heun, lms, pndm, dpms_s,
dpms_sde, dpms_m, kdpm2, kdpm2a, unipc.  Here each sampler is a pure
function running a `lax.fori_loop`/unrolled loop over *host-precomputed*
per-step coefficient arrays (the inference timestep grid is static under
jit, so every schedule scalar — sigmas, lambdas, LMS Adams-Bashforth
coefficients, midpoints — is computed once in numpy at trace time and
gathered on device).  Two-eval samplers (heun, kdpm2*, dpms_s, dpms_sde)
call the model twice per step inside the loop body.

Interface:  sample(name, schedule, denoise, z, num_steps, key, eta)
  denoise(x_t, t) -> epsilon prediction (CFG already applied; prediction
  type already normalized via NoiseSchedule.to_epsilon).
  z ~ N(0, I) with the latent shape; returns the final x0-space latent.

Implementation notes (all standard published algorithms):
  - k-diffusion-family samplers (euler/heun/lms/kdpm2*) integrate the
    probability-flow ODE dy/ds = eps in the rescaled variable
    y = x / sqrt(acp), s = sqrt(1-acp)/sqrt(acp); with that substitution
    the ODE derivative *is* the epsilon prediction.
  - DPM-Solver++ (2M multistep / 2S single-step / 2M-SDE) use the
    data-prediction formulation in lambda = log(alpha/sigma) half-space.
  - PLMS (pndm) uses the SD-default skip_prk path: one Heun-corrected
    warmup step, then 2nd/3rd/4th-order Adams-Bashforth on epsilon.
  - UniPC runs the order-2 B(h)=expm1(h) predictor-corrector.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.diffusion.schedule import NoiseSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# per-image key stacks
# ---------------------------------------------------------------------------
# Every sampler accepts either one legacy PRNG key ([2] uint32) or a
# per-image STACK ([B, 2], one key per batch row).  With a stack, every
# stochastic draw (ancestral noise, SDE noise) is made per-image via vmap,
# so image i's sample depends only on key i — generation becomes invariant
# to how a prompt list is chunked into batches (the reference's per-image
# `generator` seeding in diffusers has the same property).

def _is_stack(key: jax.Array) -> bool:
    """True when `key` is a per-image stack: raw uint32 [B, 2], or a
    typed `jax.random.key` array of shape [B] (one extra batch axis over
    the respective scalar-key shape)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim == 1
    return key.ndim == 2


def split_key(key: jax.Array):
    """`jax.random.split(key)` that also accepts a key stack."""
    if _is_stack(key):
        ks = jax.vmap(lambda k: jax.random.split(k))(key)      # [B, 2, ...]
        return ks[:, 0], ks[:, 1]
    return jax.random.split(key)


def batch_normal(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """N(0,1) of `shape`; a key stack draws row i from key i."""
    if _is_stack(key):
        if shape[0] != key.shape[0]:
            raise ValueError(f"key stack {key.shape} vs batch {shape}")
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(key)
    return jax.random.normal(key, shape, dtype)


def key_stack(base: jax.Array, start: int, n: int) -> jax.Array:
    """The canonical per-image key stack: row j is
    `fold_in(base, start + j)`.  Every producer of a [B, 2] stack goes
    through here so chunked generation reproduces image `start+j` exactly
    regardless of batch size (fold_in is collision-free across
    (base, index) pairs, unlike additive seed mixing where seed + C*j can
    alias another seed)."""
    return jax.vmap(lambda j: jax.random.fold_in(base, j))(
        jnp.arange(start, start + n))


# ---------------------------------------------------------------------------
# host-side grid helpers
# ---------------------------------------------------------------------------

def _grid(schedule: NoiseSchedule, num_steps: int,
          spacing: str = "leading", final_alpha_one: bool = True):
    """Descending timesteps + alpha/sigma arrays with the x0 boundary row.

    `spacing` follows each diffusers scheduler class's default (see
    NoiseSchedule.inference_timesteps).  Float grids ('linspace')
    interpolate in sigma-ratio space exactly like diffusers' k-family
    (`np.interp(timesteps, arange(T), sigmas)`).

    `final_alpha_one=False` = the config's `set_alpha_to_one: false`
    (SD-1.5 ships it): DDIM/PNDM's final boundary uses
    alphas_cumprod[0] (~0.99915), not 1.0, keeping a ~2.9%-of-eps
    direction term in the last update."""
    ts = np.asarray(schedule.inference_timesteps(num_steps, spacing))
    acp_full = np.asarray(schedule.alphas_cumprod)
    if ts.dtype.kind == "f":
        s_full = np.sqrt((1.0 - acp_full) / acp_full)
        s = np.interp(ts, np.arange(len(s_full)), s_full)
        acp = 1.0 / (1.0 + s ** 2)
    else:
        acp = acp_full[ts]                                        # [N]
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    # boundary: "timestep -1" == clean sample (or acp[t=0] when the
    # config pins set_alpha_to_one=False)
    final_acp = 1.0 if final_alpha_one else float(acp_full[0])
    alpha_n = np.concatenate([alpha[1:], [np.sqrt(final_acp)]])
    sigma_n = np.concatenate([sigma[1:], [np.sqrt(1.0 - final_acp)]])
    return ts, alpha, sigma, alpha_n, sigma_n


def _frac_t_for_sigma_ratio(schedule: NoiseSchedule, s_query: np.ndarray) -> np.ndarray:
    """Fractional timestep t such that sigma(t)/alpha(t) == s (k-samplers'
    interpolated midpoints).  Interpolates log-s over the training grid."""
    acp = np.asarray(schedule.alphas_cumprod)
    s_grid = np.sqrt((1.0 - acp) / acp)                           # ascending in t
    logs = np.log(s_grid)
    tq = np.interp(np.log(np.maximum(s_query, 1e-12)), logs,
                   np.arange(len(logs), dtype=np.float64))
    return tq.astype(np.float32)


# ---------------------------------------------------------------------------
# alpha-space samplers
# ---------------------------------------------------------------------------

def sample_ddim(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                eta: float = 0.0):
    # SD-1.5 config: set_alpha_to_one=false -> final boundary acp[t=0]
    ts, alpha, sigma, alpha_n, sigma_n = _grid(schedule, num_steps,
                                               final_alpha_one=False)
    # DDIM variance (Song et al. 2020, eq. 16)
    acp, acp_n = alpha ** 2, alpha_n ** 2
    var = (eta ** 2) * (1 - acp_n) / (1 - acp) * (1 - acp / acp_n)
    var = np.clip(var, 0.0, None)
    dir_coeff = np.sqrt(np.clip(1.0 - acp_n - var, 0.0, None))
    c = [jnp.asarray(v, jnp.float32) for v in
         (ts, alpha, sigma, np.sqrt(acp_n), dir_coeff, np.sqrt(var))]
    ts_j, a_j, s_j, an_j, dn_j, vn_j = c
    noisy = eta > 0

    def body(i, carry):
        x, key = carry
        eps = denoise(x, ts_j[i])
        x0 = (x - s_j[i] * eps) / a_j[i]
        x = an_j[i] * x0 + dn_j[i] * eps
        if noisy:
            key, sub = split_key(key)
            x = x + vn_j[i] * batch_normal(sub, x.shape, x.dtype)
        return x, key

    key = key if key is not None else jax.random.PRNGKey(0)
    x, _ = jax.lax.fori_loop(0, num_steps, body, (z, key))
    return x


def sample_ddpm(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                eta: float = 1.0):
    """Ancestral DDPM sampling on the inference grid."""
    ts, alpha, sigma, alpha_n, sigma_n = _grid(schedule, num_steps)
    acp, acp_n = alpha ** 2, alpha_n ** 2   # boundary row from _grid
    a_eff = acp / acp_n                     # effective per-step alpha
    b_eff = 1.0 - a_eff
    x0_coef = np.sqrt(acp_n) * b_eff / (1 - acp)
    xt_coef = np.sqrt(a_eff) * (1 - acp_n) / (1 - acp)
    var = np.clip(b_eff * (1 - acp_n) / (1 - acp), 0.0, None)
    var[-1] = 0.0
    c = [jnp.asarray(v, jnp.float32) for v in
         (ts, alpha, sigma, x0_coef, xt_coef, np.sqrt(var))]
    ts_j, a_j, s_j, x0c, xtc, stdv = c

    def body(i, carry):
        x, key = carry
        eps = denoise(x, ts_j[i])
        x0 = (x - s_j[i] * eps) / a_j[i]
        key, sub = split_key(key)
        x = x0c[i] * x0 + xtc[i] * x + stdv[i] * batch_normal(
            sub, x.shape, x.dtype)
        return x, key

    key = key if key is not None else jax.random.PRNGKey(0)
    x, _ = jax.lax.fori_loop(0, num_steps, body, (z, key))
    return x


def sample_pndm(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                eta: float = 0.0):
    """PLMS with the SD-default skip_prk warmup (Heun-corrected first step,
    then Adams-Bashforth orders 2/3/4 on epsilon)."""
    ts, alpha, sigma, alpha_n, sigma_n = _grid(schedule, num_steps,
                                               final_alpha_one=False)
    acp, acp_n = alpha ** 2, alpha_n ** 2
    samp_coef = np.sqrt(acp_n / acp)
    denom = acp * np.sqrt(1 - acp_n) + np.sqrt(acp * (1 - acp) * acp_n)
    eps_coef = (acp_n - acp) / denom
    ts_j = jnp.asarray(ts, jnp.float32)
    sc = jnp.asarray(samp_coef, jnp.float32)
    ec = jnp.asarray(eps_coef, jnp.float32)

    def transfer(i, x, eps):
        return sc[i] * x - ec[i] * eps

    # warmup: Heun-corrected first step
    e0 = denoise(z, ts_j[0])
    x1 = transfer(0, z, e0)
    e1 = denoise(x1, ts_j[1] if num_steps > 1 else jnp.float32(0.0))
    x = transfer(0, z, (e0 + e1) / 2.0)
    # diffusers step_plms never appends the warmup-corrector eval e1 to
    # ets (counter==1 branch): the AB history after warmup is [e0] alone,
    # so step 2 combines (3*e2 - e0)/2 — e1 was evaluated at the
    # UNCORRECTED x1, not at a node the AB weights assume.
    hist = jnp.stack([e0, e0, e0, e0])      # [4, ...] newest at 0

    ab = jnp.asarray([  # Adams-Bashforth coefficients by available order
        [1.0, 0.0, 0.0, 0.0],
        [3 / 2, -1 / 2, 0.0, 0.0],
        [23 / 12, -16 / 12, 5 / 12, 0.0],
        [55 / 24, -59 / 24, 37 / 24, -9 / 24],
    ], jnp.float32)

    def body(i, carry):
        x, hist = carry
        eps = denoise(x, ts_j[i])
        hist = jnp.roll(hist, 1, axis=0).at[0].set(eps)
        order = jnp.minimum(i, 3)
        w = ab[order]
        eps_comb = (w[0] * hist[0] + w[1] * hist[1]
                    + w[2] * hist[2] + w[3] * hist[3])
        return transfer(i, x, eps_comb), hist

    x, _ = jax.lax.fori_loop(1, num_steps, body, (x, hist))
    return x


# ---------------------------------------------------------------------------
# k-diffusion family (rescaled-variable ODE: dy/ds = eps)
# ---------------------------------------------------------------------------

def _s_grid(schedule, num_steps, spacing="linspace"):
    # the k-family diffusers classes default to 'linspace' float grids
    ts, alpha, sigma, alpha_n, sigma_n = _grid(schedule, num_steps,
                                               spacing=spacing)
    s = sigma / alpha
    s_next = np.concatenate([s[1:], [0.0]])
    return ts, alpha, s, s_next


def sample_euler(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                 eta: float = 0.0):
    ts, alpha, s, s_next = _s_grid(schedule, num_steps)
    ts_j = jnp.asarray(ts, jnp.float32)
    a_j = jnp.asarray(alpha, jnp.float32)
    s_j = jnp.asarray(s, jnp.float32)
    sn_j = jnp.asarray(s_next, jnp.float32)

    def body(i, y):
        eps = denoise(a_j[i] * y, ts_j[i])
        return y + (sn_j[i] - s_j[i]) * eps

    y = jax.lax.fori_loop(0, num_steps, body, z * s[0])
    return y


def sample_heun(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                eta: float = 0.0):
    ts, alpha, s, s_next = _s_grid(schedule, num_steps)
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    ts_next = np.concatenate([ts[1:], [0]]).astype(np.float32)
    ts_j, tn_j = jnp.asarray(ts, jnp.float32), jnp.asarray(ts_next)
    a_j, an_j = jnp.asarray(alpha, jnp.float32), jnp.asarray(alpha_next, jnp.float32)
    s_j, sn_j = jnp.asarray(s, jnp.float32), jnp.asarray(s_next, jnp.float32)

    def body(i, y):
        d1 = denoise(a_j[i] * y, ts_j[i])
        dt = sn_j[i] - s_j[i]
        y_e = y + dt * d1

        def heun(_):
            d2 = denoise(an_j[i] * y_e, tn_j[i])
            return y + dt * (d1 + d2) / 2.0

        return jax.lax.cond(sn_j[i] > 0, heun, lambda _: y_e, None)

    y = jax.lax.fori_loop(0, num_steps, body, z * s[0])
    return y


def sample_lms(schedule, denoise: DenoiseFn, z, num_steps, key=None,
               eta: float = 0.0, order: int = 4):
    """Linear multistep: integrate Lagrange basis polynomials over each
    [s_i, s_{i+1}] analytically on host (degree <= 3 polynomials)."""
    ts, alpha, s, s_next = _s_grid(schedule, num_steps)
    N = num_steps
    coeffs = np.zeros((N, order), np.float64)
    for i in range(N):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            # Lagrange basis l_j over nodes s[i], s[i-1], ..., s[i-cur_order+1]
            nodes = [s[i - k] for k in range(cur_order)]
            poly = np.poly1d([1.0])
            for k in range(cur_order):
                if k != j:
                    poly *= np.poly1d([1.0, -nodes[k]]) / (nodes[j] - nodes[k])
            integ = poly.integ()
            coeffs[i, j] = integ(s_next[i]) - integ(s[i])
    ts_j = jnp.asarray(ts, jnp.float32)
    a_j = jnp.asarray(alpha, jnp.float32)
    c_j = jnp.asarray(coeffs, jnp.float32)

    def body(i, carry):
        y, hist = carry
        eps = denoise(a_j[i] * y, ts_j[i])
        hist = jnp.roll(hist, 1, axis=0).at[0].set(eps)
        upd = sum(c_j[i, j] * hist[j] for j in range(order))
        return y + upd, hist

    y0 = z * s[0]
    hist0 = jnp.zeros((order,) + z.shape, z.dtype)
    y, _ = jax.lax.fori_loop(0, num_steps, body, (y0, hist0))
    return y


def _kdpm2_grids(schedule, num_steps):
    ts, alpha, s, s_next = _s_grid(schedule, num_steps)
    s_mid = np.sqrt(np.maximum(s * s_next, 1e-20))            # geometric mean
    t_mid = _frac_t_for_sigma_ratio(schedule, s_mid)
    a_mid = 1.0 / np.sqrt(1.0 + s_mid ** 2)
    return ts, alpha, s, s_next, s_mid, t_mid, a_mid


def sample_kdpm2(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                 eta: float = 0.0):
    """DPM-Solver-2 midpoint (log-s space midpoint), k-diffusion style."""
    ts, alpha, s, s_next, s_mid, t_mid, a_mid = _kdpm2_grids(schedule, num_steps)
    j = lambda v: jnp.asarray(v, jnp.float32)
    ts_j, a_j, s_j, sn_j = j(ts), j(alpha), j(s), j(s_next)
    sm_j, tm_j, am_j = j(s_mid), j(t_mid), j(a_mid)

    def body(i, y):
        d1 = denoise(a_j[i] * y, ts_j[i])

        def midpoint(_):
            y_mid = y + (sm_j[i] - s_j[i]) * d1
            d2 = denoise(am_j[i] * y_mid, tm_j[i])
            return y + (sn_j[i] - s_j[i]) * d2

        return jax.lax.cond(sn_j[i] > 0, midpoint,
                            lambda _: y + (sn_j[i] - s_j[i]) * d1, None)

    return jax.lax.fori_loop(0, num_steps, body, z * s[0])


def sample_kdpm2_ancestral(schedule, denoise: DenoiseFn, z, num_steps,
                           key=None, eta: float = 1.0):
    ts, alpha, s, s_next = _s_grid(schedule, num_steps)
    s_up = np.sqrt(np.clip(s_next ** 2 * (s ** 2 - s_next ** 2)
                           / np.maximum(s ** 2, 1e-20), 0, None))
    s_down = np.sqrt(np.clip(s_next ** 2 - s_up ** 2, 0, None))
    s_mid = np.sqrt(np.maximum(s * s_down, 1e-20))
    t_mid = _frac_t_for_sigma_ratio(schedule, s_mid)
    a_mid = 1.0 / np.sqrt(1.0 + s_mid ** 2)
    j = lambda v: jnp.asarray(v, jnp.float32)
    ts_j, a_j, s_j, sn_j = j(ts), j(alpha), j(s), j(s_next)
    sd_j, su_j, sm_j, tm_j, am_j = j(s_down), j(s_up), j(s_mid), j(t_mid), j(a_mid)

    def body(i, carry):
        y, key = carry
        d1 = denoise(a_j[i] * y, ts_j[i])

        def midpoint(_):
            y_mid = y + (sm_j[i] - s_j[i]) * d1
            d2 = denoise(am_j[i] * y_mid, tm_j[i])
            return y + (sd_j[i] - s_j[i]) * d2

        y = jax.lax.cond(sd_j[i] > 0, midpoint,
                         lambda _: y + (sd_j[i] - s_j[i]) * d1, None)
        key, sub = split_key(key)
        y = y + su_j[i] * batch_normal(sub, y.shape, y.dtype)
        return y, key

    key = key if key is not None else jax.random.PRNGKey(0)
    y, _ = jax.lax.fori_loop(0, num_steps, body, (z * s[0], key))
    return y


# ---------------------------------------------------------------------------
# DPM-Solver++ family (data prediction, lambda half-space)
# ---------------------------------------------------------------------------

def _lambda_grids(schedule, num_steps, spacing="linspace_round",
                  final_alpha_one=False):
    """diffusers 0.24.0 DPM/UniPC grids: set_timesteps appends
    `sigma_last = sqrt((1-acp[0])/acp[0])` (lambda_min_clipped=-inf), so
    the final boundary is acp[t=0], NOT sigma=0 (`final_sigmas_type`
    arrived in later diffusers).  The k-diffusion SDE port is the one
    lambda sampler that does end at sigma=0 (final_alpha_one=True)."""
    ts, alpha, sigma, alpha_n, sigma_n = _grid(schedule, num_steps,
                                               spacing=spacing,
                                               final_alpha_one=final_alpha_one)
    lam = np.log(alpha / np.maximum(sigma, 1e-10))
    lam_n = np.log(alpha_n / np.maximum(sigma_n, 1e-10))
    return ts, alpha, sigma, alpha_n, sigma_n, lam, lam_n


def sample_dpmpp_2m(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                    eta: float = 0.0):
    """DPM-Solver++(2M): multistep, 1 model eval/step, SD's workhorse
    (`run_eval_base.py:17` default dpms_m).

    diffusers 0.24.0 semantics (the reference pin): the
    lower_order_final/-second demotions apply ONLY when
    len(timesteps) < 15 ("improve numerical stability for small number
    of steps") — at the protocol's 25 steps every step past the warmup,
    including the last, is 2nd order."""
    ts, alpha, sigma, alpha_n, sigma_n, lam, lam_n = _lambda_grids(
        schedule, num_steps)
    h = lam_n - lam
    h_prev = np.concatenate([[1.0], h[:-1]])
    r = h_prev / np.maximum(h, 1e-10)
    use2 = np.arange(num_steps) >= 1
    if num_steps < 15:
        # lower_order_final; the sibling lower_order_second guard only
        # demotes 3rd->2nd order, so it never fires at solver_order=2
        use2[-1] = False
    emh = (sigma_n / np.maximum(sigma, 1e-10)) * (alpha / alpha_n)  # exp(-h)
    j = lambda v: jnp.asarray(v, jnp.float32)
    ts_j, a_j, s_j = j(ts), j(alpha), j(sigma)
    an_j, sn_j, emh_j, r_j = j(alpha_n), j(sigma_n), j(emh), j(r)
    use2_j = jnp.asarray(use2)

    def body(i, carry):
        x, x0_prev = carry
        eps = denoise(x, ts_j[i])
        x0 = (x - s_j[i] * eps) / a_j[i]
        corr = 1.0 / (2.0 * r_j[i])
        D = jnp.where(use2_j[i], (1 + corr) * x0 - corr * x0_prev, x0)
        x = (sn_j[i] / s_j[i]) * x - an_j[i] * (emh_j[i] - 1.0) * D
        return x, x0

    x, _ = jax.lax.fori_loop(0, num_steps, body, (z, jnp.zeros_like(z)))
    return x


def sample_dpmpp_2s(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                    eta: float = 0.0):
    """DPM-Solver++(2S): single-step 2nd order, 2 model evals/step."""
    ts, alpha, sigma, alpha_n, sigma_n, lam, lam_n = _lambda_grids(
        schedule, num_steps)
    h = lam_n - lam
    lam_mid = lam + h / 2.0
    # mid-point alpha/sigma from lambda: alpha^2 = sigmoid(2*lam)
    a_mid = np.sqrt(1.0 / (1.0 + np.exp(-2 * lam_mid)))
    s_mid = np.sqrt(1.0 - a_mid ** 2)
    acp = np.asarray(schedule.alphas_cumprod)
    lam_grid = 0.5 * np.log(acp / np.maximum(1 - acp, 1e-12))   # descending in t
    # interpolate t(lambda): xp must ascend -> reverse the grid
    t_mid = np.interp(lam_mid, lam_grid[::-1],
                      np.arange(len(lam_grid), dtype=np.float64)[::-1])
    # last step: first-order to the boundary
    last = num_steps - 1
    emh = (sigma_n / np.maximum(sigma, 1e-10)) * (alpha / alpha_n)
    emh2 = (s_mid / np.maximum(sigma, 1e-10)) * (alpha / a_mid)  # exp(-h/2)
    j = lambda v: jnp.asarray(v, jnp.float32)
    ts_j, a_j, s_j = j(ts), j(alpha), j(sigma)
    an_j, sn_j = j(alpha_n), j(sigma_n)
    am_j, sm_j, tm_j = j(a_mid), j(s_mid), j(t_mid)
    emh_j, emh2_j = j(emh), j(emh2)

    def body(i, x):
        eps = denoise(x, ts_j[i])
        x0 = (x - s_j[i] * eps) / a_j[i]

        def second(_):
            u = (sm_j[i] / s_j[i]) * x - am_j[i] * (emh2_j[i] - 1.0) * x0
            eps_m = denoise(u, tm_j[i])
            x0_m = (u - sm_j[i] * eps_m) / am_j[i]
            return (sn_j[i] / s_j[i]) * x - an_j[i] * (emh_j[i] - 1.0) * x0_m

        def first(_):
            return (sn_j[i] / s_j[i]) * x - an_j[i] * (emh_j[i] - 1.0) * x0

        return jax.lax.cond(i < last, second, first, None)

    return jax.lax.fori_loop(0, num_steps, body, z)


def sample_dpmpp_2m_sde(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                        eta: float = 1.0):
    """DPM-Solver++(2M) SDE (the stochastic variant behind the reference's
    'dpms_sde' menu entry; eta=1)."""
    ts, alpha, sigma, alpha_n, sigma_n, lam, lam_n = _lambda_grids(
        schedule, num_steps, spacing="linspace", final_alpha_one=True)
    h = lam_n - lam
    h_prev = np.concatenate([[1.0], h[:-1]])
    r = h_prev / np.maximum(h, 1e-10)
    use2 = np.arange(num_steps) >= 1
    use2[-1] = False
    emh = (sigma_n / np.maximum(sigma, 1e-10)) * (alpha / alpha_n)   # e^{-h}
    # SDE-DPM-Solver++ first-order transfer (eta-noised):
    #   x_t = (sigma_t/sigma_s) e^{-eta h} x_s + alpha_t (1 - e^{-(1+eta)h}) D
    #         + sigma_t sqrt(1 - e^{-2 eta h}) z
    x_decay = emh ** eta
    data_w = 1.0 - emh ** (1.0 + eta)
    noise_std = sigma_n * np.sqrt(np.clip(1.0 - emh ** (2.0 * eta), 0.0, None))
    j = lambda v: jnp.asarray(v, jnp.float32)
    ts_j, a_j, s_j = j(ts), j(alpha), j(sigma)
    an_j, sn_j = j(alpha_n), j(sigma_n)
    xd_j, dw_j, r_j, nstd_j = j(x_decay), j(data_w), j(r), j(noise_std)
    use2_j = jnp.asarray(use2)

    def body(i, carry):
        x, x0_prev, key = carry
        eps = denoise(x, ts_j[i])
        x0 = (x - s_j[i] * eps) / a_j[i]
        corr = 1.0 / (2.0 * r_j[i])
        D = jnp.where(use2_j[i], (1 + corr) * x0 - corr * x0_prev, x0)
        x = (sn_j[i] / s_j[i]) * xd_j[i] * x + an_j[i] * dw_j[i] * D
        key, sub = split_key(key)
        x = x + nstd_j[i] * batch_normal(sub, x.shape, x.dtype)
        return x, x0, key

    key = key if key is not None else jax.random.PRNGKey(0)
    x, _, _ = jax.lax.fori_loop(0, num_steps, body,
                                (z, jnp.zeros_like(z), key))
    return x


def sample_unipc(schedule, denoise: DenoiseFn, z, num_steps, key=None,
                 eta: float = 0.0):
    """UniPC order-2 (bh2 variant: B(h)=expm1(-h) in data-prediction form).

    UniP-2 with bh2 is algebraically identical to DPM-Solver++(2M)
    (rhos_p = [0.5]); the distinguishing UniC corrector re-derives x_i from
    x_{i-1} once the model value at (the predicted) x_i is available,
    replacing the extrapolated difference with the actual one — one model
    eval per step, like 2M, but ~1 order higher accuracy.
    """
    ts, alpha, sigma, alpha_n, sigma_n, lam, lam_n = _lambda_grids(
        schedule, num_steps)
    h = lam_n - lam
    h_prev = np.concatenate([[1.0], h[:-1]])
    r = h_prev / np.maximum(h, 1e-10)
    use2 = np.arange(num_steps) >= 1
    # UNLIKE the multistep DPM class, UniPC 0.24.0's lower_order_final
    # (this_order = min(order, len(timesteps) - step_index)) demotes the
    # final predictor to 1st order at EVERY step count, not just < 15
    use2[-1] = False
    emh = (sigma_n / np.maximum(sigma, 1e-10)) * (alpha / alpha_n)  # e^{-h}
    phi1 = emh - 1.0
    phi1_prev = np.concatenate([[0.0], phi1[:-1]])
    sig_prev = np.concatenate([[1.0], sigma[:-1]])
    j = lambda v: jnp.asarray(v, jnp.float32)
    ts_j, a_j, s_j = j(ts), j(alpha), j(sigma)
    an_j, sn_j, phi1_j, r_j = j(alpha_n), j(sigma_n), j(phi1), j(r)
    phi1p_j, sigp_j = j(phi1_prev), j(sig_prev)
    use2_j = jnp.asarray(use2)

    def body(i, carry):
        x, x_prev, x0_prev, key = carry
        eps = denoise(x, ts_j[i])
        x0 = (x - s_j[i] * eps) / a_j[i]
        # UniC: correct x (predicted at step i-1) using the fresh x0_i.
        d1_t = x0 - x0_prev
        x_corr = (s_j[i] / sigp_j[i]) * x_prev - a_j[i] * phi1p_j[i] * (
            x0_prev + 0.5 * d1_t)
        x = jnp.where(i >= 1, x_corr, x)   # corrector valid once a step exists
        # UniP-2 (== DPM++ 2M) predictor for the next point.
        corr = 1.0 / (2.0 * r_j[i])
        D = jnp.where(use2_j[i], (1 + corr) * x0 - corr * x0_prev, x0)
        x_next = (sn_j[i] / s_j[i]) * x - an_j[i] * phi1_j[i] * D
        return x_next, x, x0, key

    key = key if key is not None else jax.random.PRNGKey(0)
    x, _, _, _ = jax.lax.fori_loop(
        0, num_steps, body, (z, jnp.zeros_like(z), jnp.zeros_like(z), key))
    return x


# ---------------------------------------------------------------------------
# registry — names match evaluation/utils_eval.py:83-106
# ---------------------------------------------------------------------------

SAMPLERS: Dict[str, Callable] = {
    "ddim": sample_ddim,
    "ddpm": sample_ddpm,
    "euler": sample_euler,
    "heun": sample_heun,
    "lms": sample_lms,
    "pndm": sample_pndm,
    "dpms_s": sample_dpmpp_2s,
    "dpms_sde": sample_dpmpp_2m_sde,
    "dpms_m": sample_dpmpp_2m,
    "kdpm2": sample_kdpm2,
    "kdpm2a": sample_kdpm2_ancestral,
    "unipc": sample_unipc,
}


def sample(name: str, schedule: NoiseSchedule, denoise: DenoiseFn,
           z: jnp.ndarray, num_steps: int,
           key: Optional[jax.Array] = None, eta: float = 0.0) -> jnp.ndarray:
    """Run sampler `name`. Stochastic samplers use their natural eta when
    the caller passes eta=0 (ddpm/kdpm2a/dpms_sde are inherently noisy)."""
    if name not in SAMPLERS:
        raise ValueError(f"unknown sampler {name!r}; have {sorted(SAMPLERS)}")
    fn = SAMPLERS[name]
    if name in ("ddpm", "kdpm2a", "dpms_sde"):
        return fn(schedule, denoise, z, num_steps, key=key)
    return fn(schedule, denoise, z, num_steps, key=key, eta=eta)
