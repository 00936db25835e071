from deeplocalproteindocking_tpu.sweep.docker import (  # noqa: F401
    DockResult, dock_sweep,
)
from deeplocalproteindocking_tpu.sweep.cluster import (  # noqa: F401
    pose_pairwise_rmsd, nms_cluster,
)
