from .pooling import (
    avg_pool,
    gem_pool,
    l2_normalize,
    mac_pool,
    pool,
    rmac_pool,
    rmac_region_grid,
    rmac_regional_descriptors,
)
from .whitening import WhiteningParams, apply_whitening, fit_whitening
from .local_whiten import (LocalWhiteningParams, apply_local_whitening,
                           fit_local_whitening)

__all__ = [
    "avg_pool", "gem_pool", "l2_normalize", "mac_pool", "pool",
    "rmac_pool", "rmac_region_grid", "rmac_regional_descriptors",
    "WhiteningParams", "apply_whitening", "fit_whitening",
    "LocalWhiteningParams", "apply_local_whitening", "fit_local_whitening",
]
