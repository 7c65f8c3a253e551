from .stencil import (
    laplacian_interior, laplacian, leapfrog, apply_taper,
    inject_point, inject_gaussian, inject_receivers, imaging_correlation,
)
