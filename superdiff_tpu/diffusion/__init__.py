from superdiff_tpu.diffusion.schedules import DiffusionSchedule, make_schedule
from superdiff_tpu.diffusion.process import q_sample, p_losses, training_step
from superdiff_tpu.diffusion.samplers import (ddpm_sample, ddim_sample,
                                              dpmpp_sample)

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "q_sample",
    "p_losses",
    "training_step",
    "ddpm_sample",
    "ddim_sample",
    "dpmpp_sample",
]
