from deeplocalproteindocking_tpu.models.representation import Representation  # noqa: F401
from deeplocalproteindocking_tpu.models.scoring import ScoringModel  # noqa: F401
