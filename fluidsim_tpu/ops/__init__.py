from .boundary import set_bnd_2d, set_bnd_3d, interior_mask
from .linsolve import diffuse_2d, lin_solve_2d, jacobi_3d, diffuse_3d
from .advect import advect_2d, advect_3d, advect_multi_3d, advect_maccormack_3d, advect_substep_3d
from .project import project_2d, project_3d
from .fft_poisson import project_3d_fft
from .forces import (
    enforce_obstacle_boundaries_2d,
    enforce_obstacle_boundaries_3d,
    apply_turbulent_noise_2d,
    apply_turbulent_noise_3d,
    buoyancy_force,
    vorticity_confinement_3d,
)
