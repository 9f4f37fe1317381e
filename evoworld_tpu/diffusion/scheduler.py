"""Euler discrete scheduler (Karras sigmas) + EDM preconditioning, as pure
functions.

Replaces diffusers' `EulerDiscreteScheduler` as configured by the SVD
checkpoint consumed by the reference (sigma_max ~ 700 noted at
/root/reference/evoworld/pipeline/pipeline_evoworld.py:433-434; 25 Euler steps
with v-prediction). The EDM training-side preconditioning mirrors
/root/reference/evoworld/trainer/train_evoworld.py:605-712:

    c_in   = 1 / sqrt(sigma^2 + 1)
    c_skip = 1 / (sigma^2 + 1)
    c_out  = -sigma / sqrt(sigma^2 + 1)
    t      = 0.25 * log(sigma)
    loss_w = (1 + sigma^2) / sigma^2

Everything is stateless and jit-friendly; the full denoise loop lives in
`evoworld_tpu/diffusion/pipeline.py` as a `lax.scan`.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EulerScheduleConfig:
    """Karras sigma-schedule hyperparameters (SVD defaults)."""

    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0


def karras_sigmas(num_steps: int, config: EulerScheduleConfig = EulerScheduleConfig()) -> jnp.ndarray:
    """Karras et al. (2022) sigma schedule, descending, with terminal 0.

    Returns:
        (num_steps + 1,) array: sigmas[0] = sigma_max ... sigmas[-1] = 0.
    """
    ramp = jnp.linspace(0.0, 1.0, num_steps)
    inv_rho_min = config.sigma_min ** (1.0 / config.rho)
    inv_rho_max = config.sigma_max ** (1.0 / config.rho)
    sigmas = (inv_rho_max + ramp * (inv_rho_min - inv_rho_max)) ** config.rho
    return jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])


def sigma_to_timestep(sigma: jnp.ndarray) -> jnp.ndarray:
    """Continuous timestep conditioning: t = 0.25 * log(sigma)."""
    return 0.25 * jnp.log(sigma)


def scale_model_input(sample: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Input preconditioning c_in: sample / sqrt(sigma^2 + 1)."""
    return sample / jnp.sqrt(sigma**2 + 1.0)


def denoised_from_v(model_output: jnp.ndarray, sample: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the denoised sample from a v-prediction model output.

    denoised = c_out * model_output + c_skip * sample with the EDM
    coefficients above; `sample` is the *unscaled* noisy latent.
    """
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_skip = 1.0 / (sigma**2 + 1.0)
    return model_output * c_out + sample * c_skip


def euler_step(
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
) -> jnp.ndarray:
    """One deterministic Euler step x_t -> x_{t-1}.

    Args:
        model_output: raw v-prediction UNet output.
        sample: current noisy latent (unscaled).
        sigma: current noise level.
        sigma_next: next (smaller) noise level.
    """
    denoised = denoised_from_v(model_output, sample, sigma)
    derivative = (sample - denoised) / sigma
    return sample + derivative * (sigma_next - sigma)


def edm_precondition(sigma: jnp.ndarray):
    """Return (c_in, c_skip, c_out, timestep) for training-side EDM."""
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    return c_in, c_skip, c_out, sigma_to_timestep(sigma)


def edm_loss_weight(sigma: jnp.ndarray) -> jnp.ndarray:
    """EDM MSE weighting (1 + sigma^2) / sigma^2."""
    return (1.0 + sigma**2) / sigma**2


def rand_log_normal(key, shape, loc: float, scale: float, dtype=jnp.float32) -> jnp.ndarray:
    """sigma ~ exp(N(loc, scale^2)); reference `rand_log_normal`
    (/root/reference/evoworld/trainer/trainer_utils.py:11)."""
    import jax

    return jnp.exp(loc + scale * jax.random.normal(key, shape, dtype))
