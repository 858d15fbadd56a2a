from .halo_kernel import jacobi_ext_pallas, jacobi_ext_rdma
from .jacobi import jacobi_3d_pallas, pallas_supported
from .advect import advect_multi_3d_pallas
from .project import project_3d_pallas
from .resident import (
    jacobi_3d_resident,
    project_3d_resident,
    resident_fits,
)
from .resident2d import lin_solve_2d_resident, resident2d_usable
