from .noise_schedule import NoiseScheduleVP, interp_with_extrapolation
from .dpm_solver import DPMSolver
from .euler_maruyama import euler_maruyama
from .pndm import PNDMPlan, make_pndm_plan, pndm_sample
