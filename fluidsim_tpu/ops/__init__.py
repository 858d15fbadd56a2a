from .boundary import set_bnd_2d, set_bnd_3d, interior_mask
from .linsolve import diffuse_2d, lin_solve_2d, jacobi_3d
from .advect import advect_2d, advect_3d
from .project import project_2d, project_3d
from .forces import (
    enforce_obstacle_boundaries_2d,
    apply_turbulent_noise_2d,
    buoyancy_force,
    vorticity_confinement_3d,
)
