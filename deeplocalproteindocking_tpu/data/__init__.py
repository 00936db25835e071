from deeplocalproteindocking_tpu.data.benchmark import (  # noqa: F401
    Complex, load_complex, list_benchmark, synthetic_complex,
    structure_to_device,
)
