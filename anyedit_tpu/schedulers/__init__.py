from anyedit_tpu.schedulers.common import (
    NoiseSchedule, make_noise_schedule, add_noise, velocity_target, pred_x0,
)
from anyedit_tpu.schedulers.ddim import DDIMState, ddim_init, ddim_step, ddim_inversion_step
from anyedit_tpu.schedulers.ddpm import ddpm_step
from anyedit_tpu.schedulers.euler import EulerState, euler_ancestral_init, euler_ancestral_step
from anyedit_tpu.schedulers.flow import FlowState, flow_init, flow_step

SCHEDULERS = ("ddim", "ddpm", "euler_a", "flow", "dpm++2m", "plms")
