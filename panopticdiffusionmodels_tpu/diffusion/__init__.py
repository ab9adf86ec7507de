from .analog_bits import int2bits, bits2int
from .sde import VPSDE, VPSDECosine, ScoreModel, ReverseSDE, ODE, get_sde
from .sde import l_simple as l_simple_continuous
from .schedule import (
    Schedule,
    stable_diffusion_beta_schedule,
    get_skip,
    l_simple,
    l_simple_panoptic,
)
from .math import stp, mos
