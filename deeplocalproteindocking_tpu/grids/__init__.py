from deeplocalproteindocking_tpu.grids.voxelize import (  # noqa: F401
    splat, default_origin,
)
from deeplocalproteindocking_tpu.grids.rotate import (  # noqa: F401
    rotate_volume, rotate_volumes,
)
from deeplocalproteindocking_tpu.grids.xplor import write_xplor  # noqa: F401
from deeplocalproteindocking_tpu.grids.ccp4 import read_ccp4, write_ccp4  # noqa: F401
