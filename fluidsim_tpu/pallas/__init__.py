from .jacobi import jacobi_3d_pallas, pallas_supported
