"""Sampler correctness against an analytically-solvable diffusion.

For data ~ N(mu, I) the Bayes-optimal epsilon predictor has a closed form;
every sampler must transport z ~ N(0, I) to samples whose mean/std match
the data distribution.  This validates the probability-flow/SDE algebra of
all 12 samplers without any trained network (SURVEY.md §4(a)).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.core.config import ScheduleConfig
from aqualora_tpu.diffusion.schedule import NoiseSchedule
from aqualora_tpu.diffusion.samplers import SAMPLERS, sample

MU = 3.0
SCHED = NoiseSchedule.create(ScheduleConfig())


def optimal_denoise(x, t):
    """E[eps | x_t] for x0 ~ N(mu, 1): posterior-mean epsilon."""
    t_lo = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                    SCHED.config.num_train_timesteps - 1)
    t_hi = jnp.clip(t_lo + 1, 0, SCHED.config.num_train_timesteps - 1)
    frac = t - t_lo
    acp = (1 - frac) * SCHED.alphas_cumprod[t_lo] + frac * SCHED.alphas_cumprod[t_hi]
    alpha, sig = jnp.sqrt(acp), jnp.sqrt(1 - acp)
    # x0 | x_t posterior mean with prior N(mu, 1)
    x0_mean = (MU * sig**2 + alpha * x) / (alpha**2 + sig**2)
    return (x - alpha * x0_mean) / sig


@pytest.mark.parametrize("name", sorted(SAMPLERS))
def test_sampler_transports_gaussian(name):
    key = jax.random.PRNGKey(42)
    z = jax.random.normal(key, (4096, 1))
    steps = 50
    out = jax.jit(lambda z: sample(name, SCHED, optimal_denoise, z, steps,
                                   key=jax.random.PRNGKey(7)))(z)
    mean = float(jnp.mean(out))
    std = float(jnp.std(out))
    assert np.isfinite(mean) and np.isfinite(std), f"{name}: non-finite"
    # Deterministic PF-ODE samplers inherit the standard z~N(0,1) init
    # mismatch vs the true marginal N(alpha_T*mu, 1) at t_start (everyone
    # initializes SD from N(0,1)); stochastic samplers forget the init.
    tol = 0.15 if name in ("ddpm", "kdpm2a", "dpms_sde") else 0.35
    assert abs(mean - MU) < tol, f"{name}: mean {mean} != {MU}"
    assert abs(std - 1.0) < 0.15, f"{name}: std {std} != 1"


def test_deterministic_samplers_cross_agree():
    """All PF-ODE samplers integrate the same ODE — at 50 steps their output
    statistics must agree tightly (catches per-sampler algebra errors)."""
    z = jax.random.normal(jax.random.PRNGKey(42), (4096, 1))
    det = ["ddim", "euler", "heun", "lms", "pndm", "dpms_s", "dpms_m",
           "kdpm2", "unipc"]
    means = {n: float(jnp.mean(sample(n, SCHED, optimal_denoise, z, 50)))
             for n in det}
    ref = means["heun"]  # 2nd-order, most accurate baseline
    for n, m in means.items():
        # pndm gets extra slack: reference PLMS semantics (the warmup
        # eval is NOT kept in the AB history, and set_alpha_to_one=False
        # shapes the endpoint) trade a little accuracy for parity —
        # see test_pndm_matches_reference_semantics
        tol = 0.03 if n == "pndm" else 0.02
        assert abs(m - ref) < tol, f"{n}: mean {m} vs heun {ref}"


@pytest.mark.parametrize("name", ["ddim", "dpms_m", "unipc", "euler"])
def test_sampler_few_steps(name):
    """10-step result close to the same sampler's 50-step result (the init
    marginal differs per grid, so compare within-sampler)."""
    z = jax.random.normal(jax.random.PRNGKey(0), (2048, 1))
    m10 = float(jnp.mean(sample(name, SCHED, optimal_denoise, z, 10)))
    m50 = float(jnp.mean(sample(name, SCHED, optimal_denoise, z, 50)))
    assert abs(m10 - m50) < 0.25, f"{name}: {m10} vs {m50}"


def test_samplers_deterministic_per_key():
    """Stochastic samplers are reproducible for a fixed key."""
    z = jax.random.normal(jax.random.PRNGKey(0), (64, 1))
    for name in ("ddpm", "kdpm2a", "dpms_sde", "ddim"):
        a = sample(name, SCHED, optimal_denoise, z, 10,
                   key=jax.random.PRNGKey(3))
        b = sample(name, SCHED, optimal_denoise, z, 10,
                   key=jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timestep_spacing_matches_diffusers_class_defaults():
    """SD-1.5's scheduler config predates timestep_spacing, so the
    reference's Scheduler.from_config falls back to each CLASS default:
    'leading'+offset (DDIM/PNDM), linspace(0,T-1,N+1).round()[::-1][:-1]
    (DPMSolver multistep/singlestep + UniPC), and float
    linspace(0,T-1,N) (Euler/Heun/LMS/KDPM2*/DPM-SDE)."""
    T = SCHED.config.num_train_timesteps
    lead = SCHED.inference_timesteps(25, "leading")
    np.testing.assert_array_equal(lead, np.arange(25)[::-1] * 40 + 1)
    lsr = SCHED.inference_timesteps(25, "linspace_round")
    np.testing.assert_array_equal(
        lsr, np.linspace(0, T - 1, 26).round()[::-1][:-1].astype(np.int32))
    lsf = SCHED.inference_timesteps(25, "linspace")
    assert lsf.dtype == np.float32
    np.testing.assert_allclose(
        lsf, np.linspace(0, T - 1, 25, dtype=np.float32)[::-1])
    with pytest.raises(ValueError):
        SCHED.inference_timesteps(25, "trailing")


def test_ddim_matches_reference_semantics():
    """sample_ddim vs a direct numpy transcription of diffusers
    DDIMScheduler.step with SD-1.5's config (leading spacing,
    steps_offset=1, set_alpha_to_one=FALSE -> final_alpha_cumprod =
    alphas_cumprod[0], eta=0)."""
    steps, T = 6, SCHED.config.num_train_timesteps
    acp_full = np.asarray(SCHED.alphas_cumprod, np.float64)
    stride = T // steps
    ts = (np.arange(steps) * stride)[::-1] + 1
    rng = np.random.RandomState(0)
    x = rng.randn(8, 1).astype(np.float32)
    z0 = x.copy()

    def eps_np(x, t):
        return np.asarray(optimal_denoise(jnp.asarray(x),
                                          jnp.float32(t)), np.float64)

    x = x.astype(np.float64)
    for i, t in enumerate(ts):
        prev_t = t - stride
        acp_t = acp_full[t]
        acp_prev = acp_full[prev_t] if prev_t >= 0 else acp_full[0]
        e = eps_np(x, t)
        x0 = (x - np.sqrt(1 - acp_t) * e) / np.sqrt(acp_t)
        x = np.sqrt(acp_prev) * x0 + np.sqrt(1 - acp_prev) * e
    ours = np.asarray(sample(
        "ddim", SCHED, optimal_denoise, jnp.asarray(z0), steps))
    np.testing.assert_allclose(ours, x, atol=2e-4)


def test_pndm_matches_reference_semantics():
    """sample_pndm vs a direct numpy transcription of diffusers
    PNDMScheduler.step_plms (skip_prk path): the warmup-corrector eval is
    NEVER appended to ets, and set_alpha_to_one=False shapes the final
    transfer."""
    steps, T = 6, SCHED.config.num_train_timesteps
    acp_full = np.asarray(SCHED.alphas_cumprod, np.float64)
    stride = T // steps
    ts = (np.arange(steps) * stride)[::-1] + 1

    def eps_np(x, t):
        return np.asarray(optimal_denoise(jnp.asarray(x),
                                          jnp.float32(t)), np.float64)

    def transfer(x, t, prev_t, e):
        acp_t = acp_full[t]
        acp_prev = acp_full[prev_t] if prev_t >= 0 else acp_full[0]
        # diffusers _get_prev_sample closed form
        num = (acp_prev - acp_t)
        denom = acp_t * np.sqrt(1 - acp_prev) + np.sqrt(
            acp_t * (1 - acp_t) * acp_prev)
        return np.sqrt(acp_prev / acp_t) * x - num / denom * e

    rng = np.random.RandomState(1)
    z0 = rng.randn(8, 1).astype(np.float32)
    x = z0.astype(np.float64)
    ets = []
    cur = x
    for i, t in enumerate(ts):
        prev_t = t - stride
        e = eps_np(x, t)
        if i == 0:
            ets.append(e)
            cur = x
            x = transfer(cur, t, prev_t, e)
            # warmup corrector at (x1, t_prev): averaged, NOT appended
            e1 = eps_np(x, prev_t if steps > 1 else 0)
            x = transfer(cur, t, prev_t, (e + e1) / 2.0)
            continue
        ets.append(e)
        if len(ets) == 2:
            comb = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            comb = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            comb = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                    - 9 * ets[-4]) / 24
        x = transfer(x, t, prev_t, comb)
    ours = np.asarray(sample(
        "pndm", SCHED, optimal_denoise, jnp.asarray(z0), steps))
    np.testing.assert_allclose(ours, x, atol=2e-4)


def test_dpms_m_matches_reference_semantics():
    """sample_dpmpp_2m vs a direct numpy transcription of diffusers
    0.24.0 DPMSolverMultistepScheduler.step (the reference pin,
    requirements.txt: diffusers==0.24.0) with SD-1.5's config:
    algorithm_type dpmsolver++, solver_type midpoint, solver_order 2,
    timesteps linspace(0,999,N+1).round()[::-1][:-1], final sigma from
    alphas_cumprod[0] (lambda_min_clipped=-inf; final_sigmas_type is a
    LATER diffusers addition), and the stability demotions gated on
    len(timesteps) < 15 — so at the protocol's 25 steps the final step
    is 2nd order, while at 8 steps lower_order_final fires."""
    acp_full = np.asarray(SCHED.alphas_cumprod, np.float64)

    def eps_np(x, t):
        return np.asarray(optimal_denoise(jnp.asarray(x, jnp.float32),
                                          jnp.float32(t)), np.float64)

    def golden(steps, z0):
        ts = np.linspace(0, 999, steps + 1).round()[::-1][:-1].astype(
            np.int64)
        sig_k = np.sqrt((1 - acp_full) / acp_full)
        sig = np.append(sig_k[ts], sig_k[0])
        alpha_t = 1.0 / np.sqrt(1 + sig ** 2)          # _sigma_to_alpha_
        sigma_t = sig * alpha_t                        # sigma_t
        lam = np.log(alpha_t / sigma_t)
        x = z0.astype(np.float64)
        m = []
        for i, t in enumerate(ts):
            e = eps_np(x, t)
            m.append((x - sigma_t[i] * e) / alpha_t[i])   # x0-prediction
            h = lam[i + 1] - lam[i]
            lof = (i == steps - 1) and steps < 15      # lower_order_final
            if i == 0 or lof:
                x = (sigma_t[i + 1] / sigma_t[i]) * x \
                    - alpha_t[i + 1] * (np.exp(-h) - 1.0) * m[-1]
            else:
                r0 = (lam[i] - lam[i - 1]) / h
                D0, D1 = m[-1], (m[-1] - m[-2]) / r0
                x = (sigma_t[i + 1] / sigma_t[i]) * x \
                    - alpha_t[i + 1] * (np.exp(-h) - 1.0) * (D0 + 0.5 * D1)
        return x

    rng = np.random.RandomState(2)
    for steps in (25, 8):
        z0 = rng.randn(8, 1).astype(np.float32)
        ours = np.asarray(sample(
            "dpms_m", SCHED, optimal_denoise, jnp.asarray(z0), steps))
        np.testing.assert_allclose(ours, golden(steps, z0), atol=1e-3,
                                   err_msg=f"steps={steps}")


def test_empirical_convergence_order():
    """Measured convergence order on the analytic PF-ODE (each sampler
    vs its own 960-step limit, so grid/endpoint conventions cancel):
    euler/ddim are 1st order; heun a clean 2nd; dpms_m 2nd-order
    interior (measured ~1.6-1.7 — the integer-rounded reference grid
    adds slowly-decaying jitter); unipc demotes its FINAL step to 1st
    order at every step count (0.24.0 lower_order_final semantics), so
    its measured order sits between — but both beat the 1st-order
    samplers' absolute error by >3x.  VERDICT r4 #4(a)."""
    z = jax.random.normal(jax.random.PRNGKey(0), (256, 1))
    errs, orders = {}, {}
    for name in ("ddim", "euler", "heun", "dpms_m", "unipc"):
        ref = np.asarray(sample(name, SCHED, optimal_denoise, z, 960))
        e = {N: float(np.abs(np.asarray(
            sample(name, SCHED, optimal_denoise, z, N)) - ref).mean())
            for N in (40, 80, 160)}
        errs[name] = e
        orders[name] = (np.log2(e[40] / e[80]), np.log2(e[80] / e[160]))
    for name in ("ddim", "euler"):                    # 1st order
        for o in orders[name]:
            assert 0.85 < o < 1.40, f"{name}: order {orders[name]}"
    for o in orders["heun"]:                          # clean 2nd order
        assert 1.80 < o < 2.30, f"heun: order {orders['heun']}"
    assert np.mean(orders["dpms_m"]) > 1.45, \
        f"dpms_m: order {orders['dpms_m']}"
    assert np.mean(orders["unipc"]) > 1.20, \
        f"unipc: order {orders['unipc']}"
    for name in ("heun", "dpms_m", "unipc"):          # absolute accuracy
        assert errs[name][160] < errs["ddim"][160] / 3.0, \
            f"{name} err {errs[name][160]} vs ddim {errs['ddim'][160]}"


GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "sampler_goldens.npz")


def compute_golden_outputs():
    """All 12 samplers on the analytic denoiser, 8- and 25-step grids.
    Regenerate with scripts/make_sampler_goldens.py after an INTENDED
    numerics change."""
    out = {}
    z = jax.random.normal(jax.random.PRNGKey(123), (8, 4))
    for name in sorted(SAMPLERS):
        for steps in (8, 25):
            out[f"{name}_{steps}"] = np.asarray(sample(
                name, SCHED, optimal_denoise, z, steps,
                key=jax.random.PRNGKey(7)), np.float32)
    return out


def test_golden_vectors_self_consistency():
    """Committed .npz goldens pin every sampler's numerics: diffusers
    step-for-step goldens are environmental (docs/EVALUATION.md), but
    any future drift in OUR algebra — a coefficient edit, a grid change,
    an accidental dtype regression — is caught here at 1e-6 even without
    diffusers installed.  VERDICT r4 #4(b)."""
    golden = np.load(GOLDEN_PATH)
    got = compute_golden_outputs()
    assert set(golden.files) == set(got)
    for k in sorted(got):
        np.testing.assert_allclose(got[k], golden[k], rtol=0, atol=2e-6,
                                   err_msg=k)
