from evoworld_tpu.diffusion.scheduler import (
    EulerScheduleConfig,
    karras_sigmas,
    sigma_to_timestep,
    scale_model_input,
    euler_step,
    edm_precondition,
    edm_loss_weight,
)

__all__ = [
    "EulerScheduleConfig",
    "karras_sigmas",
    "sigma_to_timestep",
    "scale_model_input",
    "euler_step",
    "edm_precondition",
    "edm_loss_weight",
]
