from .stable2d import simulate_step_2d, make_step_2d
from .stable3d import simulate_step_3d, make_step_3d
