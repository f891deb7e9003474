from wisp_tpu.models.grids.blas_grid import BLASGrid
from wisp_tpu.models.grids.hash_grid import HashGrid
from wisp_tpu.models.grids.utils import MultiTable
