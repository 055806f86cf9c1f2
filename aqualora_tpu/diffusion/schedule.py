"""DDPM forward-process schedule as a pure pytree of precomputed arrays.

TPU-native equivalent of the reference's `customDDPMScheduler`
(`utils/cschedulers.py:15-72`): instead of a stateful torch scheduler class,
the schedule is an immutable bundle of precomputed coefficient arrays, and
every operation is a pure function of `(schedule, tensors, timesteps)` that
jits and vmaps cleanly.

Covered reference surface:
  - `add_noise`            (diffusers DDPMScheduler.add_noise)
  - `subtract_noise`       (cschedulers.py:17-38 — invert the forward process)
  - `get_sqrt_alpha_prod_div_sqrt_one_minus_alpha_prod` (cschedulers.py:40-54)
  - `velocity_to_epsilon`  (cschedulers.py:56-72 — v-pred -> eps for SD2)
  - `get_velocity`         (v-prediction target)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax.struct import dataclass as pytree_dataclass

from aqualora_tpu.core.config import ScheduleConfig


def _broadcast(coef: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Reshape a per-sample coefficient [B] to [B, 1, 1, ...] like `like`."""
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim)).astype(like.dtype)


@pytree_dataclass
class NoiseSchedule:
    betas: jnp.ndarray            # [T]
    alphas_cumprod: jnp.ndarray   # [T]
    config: ScheduleConfig = dataclasses.field(
        metadata={"pytree_node": False}, default_factory=ScheduleConfig)

    # -- construction ------------------------------------------------------
    @staticmethod
    def create(config: ScheduleConfig | None = None) -> "NoiseSchedule":
        import numpy as np
        cfg = config or ScheduleConfig()
        T = cfg.num_train_timesteps
        if cfg.beta_schedule == "linear":
            betas = np.linspace(cfg.beta_start, cfg.beta_end, T, dtype=np.float64)
        elif cfg.beta_schedule == "scaled_linear":
            betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, T,
                                dtype=np.float64) ** 2
        elif cfg.beta_schedule == "squaredcos_cap_v2":
            t = np.arange(T + 1, dtype=np.float64) / T
            f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
            betas = np.clip(1.0 - f[1:] / f[:-1], 0.0, 0.999)
        else:
            raise ValueError(f"unknown beta_schedule {cfg.beta_schedule}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        betas, alphas_cumprod = jnp.asarray(betas), jnp.asarray(alphas_cumprod)
        return NoiseSchedule(betas=betas.astype(jnp.float32),
                             alphas_cumprod=alphas_cumprod.astype(jnp.float32),
                             config=cfg)

    # -- coefficient lookups -----------------------------------------------
    def sqrt_alpha_prod(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.sqrt(self.alphas_cumprod[t])

    def sqrt_one_minus_alpha_prod(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alphas_cumprod[t])

    def snr_coeff(self, t: jnp.ndarray) -> jnp.ndarray:
        """sqrt(acp)/sqrt(1-acp) — cschedulers.py:40-54."""
        return self.sqrt_alpha_prod(t) / self.sqrt_one_minus_alpha_prod(t)

    # -- forward process ----------------------------------------------------
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
        a = _broadcast(self.sqrt_alpha_prod(t), x0)
        s = _broadcast(self.sqrt_one_minus_alpha_prod(t), x0)
        return a * x0 + s * noise

    def subtract_noise(self, xt: jnp.ndarray, noise: jnp.ndarray,
                       t: jnp.ndarray) -> jnp.ndarray:
        """Invert the forward process: x0 = (x_t - sqrt(1-acp) eps)/sqrt(acp).

        Reference: cschedulers.py:17-38.
        """
        a = _broadcast(self.sqrt_alpha_prod(t), xt)
        s = _broadcast(self.sqrt_one_minus_alpha_prod(t), xt)
        return (xt - s * noise) / a

    # -- prediction-type conversions ----------------------------------------
    def velocity_to_epsilon(self, v: jnp.ndarray, xt: jnp.ndarray,
                            t: jnp.ndarray) -> jnp.ndarray:
        """eps = sqrt(acp) v + sqrt(1-acp) x_t  (cschedulers.py:56-72)."""
        a = _broadcast(self.sqrt_alpha_prod(t), xt)
        s = _broadcast(self.sqrt_one_minus_alpha_prod(t), xt)
        return a * v + s * xt

    def get_velocity(self, x0: jnp.ndarray, noise: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
        """v = sqrt(acp) eps - sqrt(1-acp) x0 (v-prediction training target)."""
        a = _broadcast(self.sqrt_alpha_prod(t), x0)
        s = _broadcast(self.sqrt_one_minus_alpha_prod(t), x0)
        return a * noise - s * x0

    def pred_original(self, model_out: jnp.ndarray, xt: jnp.ndarray,
                      t: jnp.ndarray, prediction_type: str | None = None) -> jnp.ndarray:
        """x0 estimate from a model output under eps/v/sample prediction."""
        kind = prediction_type or self.config.prediction_type
        a = _broadcast(self.sqrt_alpha_prod(t), xt)
        s = _broadcast(self.sqrt_one_minus_alpha_prod(t), xt)
        if kind == "epsilon":
            return (xt - s * model_out) / a
        if kind == "v_prediction":
            return a * xt - s * model_out
        if kind == "sample":
            return model_out
        raise ValueError(f"unknown prediction_type {kind}")

    def to_epsilon(self, model_out: jnp.ndarray, xt: jnp.ndarray,
                   t: jnp.ndarray, prediction_type: str | None = None) -> jnp.ndarray:
        """Normalize any prediction type to an epsilon prediction."""
        kind = prediction_type or self.config.prediction_type
        if kind == "epsilon":
            return model_out
        if kind == "v_prediction":
            return self.velocity_to_epsilon(model_out, xt, t)
        if kind == "sample":
            a = _broadcast(self.sqrt_alpha_prod(t), xt)
            s = _broadcast(self.sqrt_one_minus_alpha_prod(t), xt)
            return (xt - a * model_out) / s
        raise ValueError(f"unknown prediction_type {kind}")

    # -- inference timestep grids -------------------------------------------
    def inference_timesteps(self, num_steps: int, spacing: str = "leading"):
        """Descending timestep grid for samplers.  Host-side numpy: the
        grid is static under jit and samplers precompute coefficients
        from it.

        SD-1.5's scheduler config predates `timestep_spacing`, so the
        reference's `Scheduler.from_config(pipe.scheduler.config)`
        (`evaluation/utils_eval.py:83-106`) falls back to each CLASS
        default — three distinct grids:
          'leading'        : stride grid + steps_offset (DDIM/PNDM/DDPM)
          'linspace_round' : linspace(0, T-1, N+1).round()[::-1][:-1]
                             (DPMSolver multistep/singlestep, UniPC)
          'linspace'       : linspace(0, T-1, N) float points
                             (Euler/Heun/LMS/KDPM2*/DPM-SDE)"""
        import numpy as np
        T = self.config.num_train_timesteps
        if spacing == "leading":
            stride = T // num_steps
            ts = ((np.arange(num_steps) * stride)[::-1]
                  + self.config.steps_offset)
            return np.clip(ts, 0, T - 1).astype(np.int32)
        if spacing == "linspace_round":
            ts = np.linspace(0, T - 1, num_steps + 1).round()[::-1][:-1]
            return ts.astype(np.int32)
        if spacing == "linspace":
            return np.linspace(0, T - 1, num_steps,
                               dtype=np.float32)[::-1].copy()
        raise ValueError(f"unknown timestep spacing {spacing!r}")
