from deeplocalproteindocking_tpu.correlate.fft import (  # noqa: F401
    receptor_transform, correlate_scores, score_at,
    flat_index_to_shift, shift_to_flat_index, translation_mask,
)
