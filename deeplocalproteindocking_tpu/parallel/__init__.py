from deeplocalproteindocking_tpu.parallel.mesh import make_mesh  # noqa: F401
from deeplocalproteindocking_tpu.parallel.sharded_sweep import (  # noqa: F401
    sharded_dock_sweep,
)
from deeplocalproteindocking_tpu.parallel.train_parallel import (  # noqa: F401
    make_parallel_train_step,
)
