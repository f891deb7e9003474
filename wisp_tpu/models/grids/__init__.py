from wisp_tpu.models.grids.blas_grid import BLASGrid
from wisp_tpu.models.grids.hash_grid import HashGrid
from wisp_tpu.models.grids.octree_grid import OctreeGrid
from wisp_tpu.models.grids.codebook_grid import CodebookOctreeGrid
from wisp_tpu.models.grids.triplanar_grid import TriplanarGrid, TriplanarFeatureVolume
from wisp_tpu.models.grids.utils import MultiTable
