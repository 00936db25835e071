from deeplocalproteindocking_tpu.train.decoys import (  # noqa: F401
    DecoySet, generate_decoys,
)
from deeplocalproteindocking_tpu.train.losses import ranking_hinge_loss  # noqa: F401
from deeplocalproteindocking_tpu.train.trainer import (  # noqa: F401
    TrainState, Trainer, TrainBatch,
)
