from .schedule import (
    DiffusionSchedule,
    cosine_beta_schedule,
    ddim_time_pairs,
    make_schedule,
    predict_noise_from_start,
    q_sample,
    signed_fractional_noise,
)

__all__ = [
    "DiffusionSchedule",
    "cosine_beta_schedule",
    "make_schedule",
    "q_sample",
    "predict_noise_from_start",
    "signed_fractional_noise",
    "ddim_time_pairs",
]
